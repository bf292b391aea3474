"""General runtime utilities: logging, paths, provenance, bins.

Reproduces the behavior of the reference's src/utils/util.py (561 LoC) —
setup_logger (:444-488), get_model_folder/get_experiment_name, bins helpers
(:540-550), unique_path_combine (:249-279), run-info provenance (:350-401),
file MD5 (:375-392), checkpoint retrieval (:170-200), replace_file_pattern
(:527-537), flatten.
"""
from __future__ import annotations

import getpass
import glob
import hashlib
import json
import logging
import os
import platform
import re
import subprocess
import sys
import time
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------------
# logging (ref: util.py:444-488 — verbosity 1-5 → log levels, console + file)
# ---------------------------------------------------------------------------------

_VERBOSITY_LEVELS = {
    0: logging.CRITICAL,
    1: logging.ERROR,
    2: logging.WARNING,
    3: logging.INFO,
    4: logging.DEBUG,
    5: logging.DEBUG,
}


def setup_logger(verbosity: int = 3, logfile: Optional[str] = None,
                 name: str = "waveformml_tpu") -> logging.Logger:
    level = _VERBOSITY_LEVELS.get(int(verbosity), logging.DEBUG)
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers = []
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if logfile:
        os.makedirs(os.path.dirname(os.path.abspath(logfile)), exist_ok=True)
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_logger(name: str = "waveformml_tpu") -> logging.Logger:
    return logging.getLogger(name)


# ---------------------------------------------------------------------------------
# paths / experiment folders (ref: util.py get_model_folder, main.py:99-109)
# ---------------------------------------------------------------------------------

def get_model_folder(config) -> str:
    base = getattr(config.system_config, "model_base_path", "./model")
    folder = os.path.join(base, config.system_config.model_name)
    os.makedirs(folder, exist_ok=True)
    return folder


def next_experiment_name(model_folder: str, exp_name: str) -> str:
    """Auto-increment exp_name if a run dir already exists
    (ref: main.py:99-109)."""
    runs = os.path.join(model_folder, "runs")
    if not os.path.isdir(os.path.join(runs, exp_name)):
        return exp_name
    i = 1
    while os.path.isdir(os.path.join(runs, f"{exp_name}_{i}")):
        i += 1
    return f"{exp_name}_{i}"


def next_version_dir(run_dir: str) -> str:
    """TensorBoard-style version_<n> dirs (ref: main.py:144-165)."""
    n = 0
    while os.path.isdir(os.path.join(run_dir, f"version_{n}")):
        n += 1
    return os.path.join(run_dir, f"version_{n}")


def unique_path_combine(paths: Sequence[str]) -> str:
    """Derive a dataset/model name from a list of paths by stripping the common
    prefix and joining distinctive parts (ref: util.py:249-279)."""
    if not paths:
        return ""
    normed = [os.path.normpath(p) for p in paths]
    if len(normed) == 1:
        return os.path.basename(normed[0])
    parts = [p.split(os.sep) for p in normed]
    # strip common leading components
    i = 0
    while all(len(p) > i for p in parts) and len({p[i] for p in parts}) == 1:
        i += 1
    distinct = ["_".join([c for c in p[i:] if c]) for p in parts]
    distinct = [d for d in distinct if d]
    if not distinct:
        return os.path.basename(normed[0])
    return "__".join(distinct)


def replace_file_pattern(path: str, pattern: str, replacement: str) -> str:
    """Replace a glob-ish suffix pattern in a filename (ref: util.py:527-537)."""
    base = os.path.basename(path)
    pat = pattern.replace("*", "")
    if base.endswith(pat):
        base = base[: -len(pat)] + replacement.replace("*", "")
    else:
        base = base.replace(pat, replacement.replace("*", ""))
    return os.path.join(os.path.dirname(path), base)


def flatten(nested: Iterable[Any]) -> List[Any]:
    out: List[Any] = []
    for x in nested:
        if isinstance(x, (list, tuple)):
            out.extend(flatten(x))
        else:
            out.append(x)
    return out


# ---------------------------------------------------------------------------------
# checkpoint discovery (ref: util.py:170-200 retrieve_model_checkpoint)
# ---------------------------------------------------------------------------------

_CKPT_METRIC_RE = re.compile(r"val_loss[=\-]([0-9]*\.?[0-9]+)")


def retrieve_best_checkpoint(model_folder: str) -> Optional[str]:
    """Glob ``**/*.ckpt``-style checkpoint dirs/files, parse the val metric out
    of the name, return the best (lowest) one (ref: util.py:170-200).

    Our checkpoints are orbax directories named ``epoch=E-val_loss=V.ckpt``.
    """
    candidates = glob.glob(os.path.join(model_folder, "**", "*.ckpt"), recursive=True)
    best, best_metric = None, None
    fallback, fallback_mtime = None, -1.0
    for c in candidates:
        m = _CKPT_METRIC_RE.search(os.path.basename(c))
        if m:
            metric = float(m.group(1))
            if metric == metric and (best_metric is None or metric < best_metric):
                best, best_metric = c, metric
        else:
            # no parseable metric (e.g. last.ckpt): newest-mtime fallback,
            # used only when NO checkpoint carries a metric (float('inf')-1
            # == inf, so the old sentinel could never be selected)
            mt = os.path.getmtime(c)
            if mt > fallback_mtime:
                fallback, fallback_mtime = c, mt
    return best if best is not None else fallback


# ---------------------------------------------------------------------------------
# provenance (ref: util.py:350-401 get_run_info/write_run_info, :375-392 md5)
# ---------------------------------------------------------------------------------

def get_file_md5(path: str) -> str:
    """md5 of a file — or of a checkpoint DIRECTORY (orbax checkpoints are
    directories named epoch=E-val_loss=V.ckpt): the digest then covers every
    file's relative path and content, in sorted order."""
    h = hashlib.md5()
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for name in sorted(files):
                fp = os.path.join(root, name)
                h.update(os.path.relpath(fp, path).encode())
                with open(fp, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
        return h.hexdigest()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def apply_num_threads(n: Optional[int]) -> None:
    """Bound host CPU parallelism (the reference's torch.set_num_threads,
    WritePredictions.py:61-62): caps XLA's CPU intra-op/eigen pools via
    XLA_FLAGS and the native OpenMP kernels via OMP_NUM_THREADS. Call
    BEFORE the first jax device use."""
    if not n:
        return
    os.environ.setdefault("OMP_NUM_THREADS", str(n))
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_cpu_multi_thread_eigen={n > 1}"
                               f" intra_op_parallelism_threads={n}").strip()


def get_git_info(cwd: Optional[str] = None) -> Dict[str, str]:
    info = {}
    for key, cmd in (("sha", ["git", "rev-parse", "HEAD"]),
                     ("tag", ["git", "describe", "--tags", "--always"])):
        try:
            info[key] = subprocess.check_output(
                cmd, cwd=cwd or os.getcwd(), stderr=subprocess.DEVNULL
            ).decode().strip()
        except Exception:
            info[key] = "unknown"
    return info


def get_run_info() -> Dict[str, Any]:
    import jax

    return {
        "git": get_git_info(os.path.dirname(os.path.dirname(os.path.dirname(__file__)))),
        "host": platform.node(),
        "user": getpass.getuser(),
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
        "argv": sys.argv,
        "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }


def write_run_info(log_dir: str) -> None:
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "run_info.json"), "w") as f:
        json.dump(get_run_info(), f, indent=2, default=str)


# ---------------------------------------------------------------------------------
# bins / numerics (ref: util.py:540-550 get_bins/get_bin_midpoints/safe_divide)
# ---------------------------------------------------------------------------------

def get_bins(low: float, high: float, n: int) -> np.ndarray:
    """n+1 bin edges from low to high."""
    return np.linspace(low, high, int(n) + 1)


def get_bin_midpoints(low: float, high: float, n: int) -> np.ndarray:
    edges = get_bins(low, high, n)
    return 0.5 * (edges[:-1] + edges[1:])


def p2x_stem(path: str) -> str:
    """Strip the P2X type suffix from a file's BASENAME: 'run1_WFCal.h5' →
    'run1'. Uses the basename only — the reference's full-path rfind('_')
    (WritePredictions.py:31) mangles paths whose directories contain
    underscores. Shared by the prediction-writer CLIs."""
    base = os.path.basename(path)
    return base[:base.rfind("_")] if "_" in base else base[:-3]


def safe_divide(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise a/b with 0 where b == 0."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    out = np.zeros(np.broadcast(a, b).shape, dtype=np.float64)
    np.divide(a, b, out=out, where=(b != 0))
    return out


def prefetch_iter(iterable, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue — overlaps
    host IO (HDF5 chunk decode) with downstream compute. Exceptions re-raise
    in the consumer; abandoning the generator (consumer raises / breaks)
    stops the worker instead of leaving it blocked in q.put holding the
    source iterator's file handles."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not put_or_stop(item):
                    return
            put_or_stop(_END)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            put_or_stop(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persist XLA compilations across processes (first TPU compiles go
    through a slow remote-compile path here; repeat CLI runs then start in
    seconds). Honors JAX_COMPILATION_CACHE_DIR; call before first jit."""
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       "/tmp/waveformml_jax_cache")
    try:
        if jax.default_backend() == "cpu" and path is None and \
                "JAX_COMPILATION_CACHE_DIR" not in os.environ:
            # CPU AOT entries embed compile-machine feature sets; loading
            # them in a process with different detected features risks SIGILL
            # (XLA warns about exactly this), and CPU compiles are fast —
            # only persist when explicitly requested.
            return
        cache_dir = os.path.join(cache_dir, jax.default_backend())
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — run uncached
        pass
