"""bench.py orchestrator contracts: the headline sparse-PSD config must run
FIRST and its JSON line must be re-emitted as the LAST stdout line at exit
(the driver parses the final line), including via the SIGTERM handler."""
import importlib
import json
import os
import sys


def _fresh_bench():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return importlib.reload(bench)


def test_headline_runs_first():
    bench = _fresh_bench()
    assert bench.BENCHES[0] == "sparse_psd"


def test_all_configs_covered_by_two_groups():
    # stream and hpo must NOT sit in their own fresh TPU clients (each pays
    # the 1-10 min first-execution stall): every non-headline config shares
    # one long-lived child, warmed by a cheap config before stream/hpo run
    bench = _fresh_bench()
    assert len(bench.GROUPS) == 2
    grouped = [n for name, _ in bench.GROUPS for n in name.split(",")]
    assert sorted(grouped) == sorted(bench.BENCHES)
    shared = bench.GROUPS[1][0].split(",")
    assert shared[0] not in ("stream", "hpo")  # a cheap config pays the stall
    assert "stream" in shared and "hpo" in shared


def test_unknown_argv_refuses_to_run(monkeypatch, capsys):
    # a typo'd flag or stray config name must not silently launch the full
    # multi-config run (config selection is env-driven via BENCH_ONLY)
    bench = _fresh_bench()
    monkeypatch.setattr(sys, "argv", ["bench.py", "--hepl"])
    assert bench.main() == 2
    assert "bench" in capsys.readouterr().out.lower()
    assert bench.RESULTS == []


def test_finalize_reprints_headline_last(tmp_path, capsys):
    bench = _fresh_bench()
    entry = {"metric": "sparse PSD train throughput (tpu)", "value": 1.0,
             "unit": "waveforms/sec/chip", "vs_baseline": 2.0}
    bench.HEADLINE["entry"] = entry
    bench.RESULTS.append(entry)
    bench.RESULTS.append({"metric": "other", "value": 3.0})
    bench._finalize(str(tmp_path))
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == entry
    # idempotent: a second call (atexit after SIGTERM handler) prints nothing
    bench._finalize(str(tmp_path))
    assert capsys.readouterr().out == ""
    results = json.load(open(tmp_path / "bench_results.json"))
    assert len(results) == 2


def test_help_prints_usage_without_running(monkeypatch, capsys):
    # --help must never fall through to orchestrator mode (which launches a
    # multi-config benchmark run); it prints the module docstring and exits 0
    bench = _fresh_bench()
    monkeypatch.setattr(sys, "argv", ["bench.py", "--help"])
    assert bench.main() == 0
    out = capsys.readouterr().out
    assert "Benchmark suite" in out
    assert bench.RESULTS == []


def test_finalize_without_headline_is_quiet(tmp_path, capsys):
    bench = _fresh_bench()
    bench._finalize(str(tmp_path))
    assert capsys.readouterr().out == ""
    assert json.load(open(tmp_path / "bench_results.json")) == []
