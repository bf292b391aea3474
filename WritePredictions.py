#!/usr/bin/env python
"""Batch inference: stream an HDF5 file through a trained model and write a
new HDF5 with predictions swapped into place (ref: WritePredictions.py:11-86).

``python WritePredictions.py input.h5 config.json ckpt -w z``
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from os.path import basename
from os.path import expanduser, isdir, join


def main(argv=None) -> int:
    # --num_threads: set the XLA env before jax import (the reference used
    # torch.set_num_threads, WritePredictions.py:61-62)
    argv = sys.argv[1:] if argv is None else list(argv)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--num_threads", "-nt", type=int, default=None)
    pre_args, _ = pre.parse_known_args(argv)
    from waveformml_tpu.utils.util import apply_num_threads
    apply_num_threads(pre_args.num_threads)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", help="path to input hdf5 file")
    parser.add_argument("config", help="path to config file for model")
    parser.add_argument("checkpoint", help="path to checkpoint for model")
    parser.add_argument("--writer", "-w", type=str, default="z",
                        help="'z' | 'irn' | 'irnim'")
    parser.add_argument("--output", "-o", type=str,
                        help="path to output hdf5 file or directory")
    parser.add_argument("--calgroup", "-c", type=str,
                        help="calibration group for normalization (WaveformPairCal)")
    parser.add_argument("--scale_factor", "-s", type=float,
                        help="normalization scale factor")
    parser.add_argument("--datatype", "-d", type=str,
                        help="output datatype override ('WaveformPairCal'/'PhysPulse')")
    parser.add_argument("--cpu", "-cpu", action="store_true",
                        help="force CPU execution")
    parser.add_argument("--num_threads", "-nt", type=int)
    parser.add_argument("--buffer_size", "-b", type=int, default=1024 * 16,
                        help="rows buffered before flushing to disk")
    parser.add_argument("--read_size", "-r", type=int, default=2048,
                        help="rows per chunk read")
    args = parser.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from waveformml_tpu.utils.util import enable_compilation_cache
    enable_compilation_cache()

    from waveformml_tpu.inference.prediction_writer import (
        IRNIMPredictionWriter, IRNPredictionWriter, ZPredictionWriter)

    from waveformml_tpu.utils.util import p2x_stem

    input_path = expanduser(args.input_path)
    if args.datatype == "PhysPulse":
        output = join(os.path.dirname(input_path),
                      p2x_stem(input_path) + "_Phys.h5")
    else:
        # ref naming (WritePredictions.py:34) assumes a .h5 suffix; strip
        # other extensions properly instead of chopping 3 arbitrary chars
        stem = input_path[:-3] if input_path.endswith(".h5") else \
            os.path.splitext(input_path)[0]
        output = stem + "ModelOut.h5"
    if args.output is not None:
        out = expanduser(args.output)
        if out.endswith(".h5"):
            output = out
        elif isdir(out):
            # keep the type-detection suffix in directory mode too:
            # PhysPulse outputs must end in _Phys.h5 (extension_type_map)
            if args.datatype == "PhysPulse":
                output = join(out, p2x_stem(input_path) + "_Phys.h5")
            else:
                base = basename(input_path)
                base = base[:-3] if base.endswith(".h5") else \
                    os.path.splitext(base)[0]
                output = join(out, base + "ModelOut.h5")
        else:
            raise IOError(f"Output path {args.output} not a valid directory or .h5 file")
    print(f"Writing output to {output}")

    pw_args = {"n_buffer_rows": args.buffer_size, "n_rows_per_read": args.read_size}
    if args.calgroup:
        pw_args["calgroup"] = args.calgroup
    if args.scale_factor:
        pw_args["scale_factor"] = args.scale_factor
    if args.datatype:
        pw_args["datatype"] = args.datatype

    writers = {"z": ZPredictionWriter, "irn": IRNPredictionWriter,
               "irnim": IRNIMPredictionWriter}
    if args.writer not in writers:
        raise IOError(f"{args.writer} not a valid choice for writer.")
    start = time.time()
    pw = writers[args.writer](output, input_path, args.config, args.checkpoint,
                              **pw_args)
    print("Writing predictions")
    pw.write_predictions()
    runtime = time.time() - start
    print("Success")
    print("Writing XML metadata")
    pw.write_XML(runtime)
    print("Success")
    return 0


if __name__ == "__main__":
    sys.exit(main())
