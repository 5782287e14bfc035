"""bench.py's un-voidable emit contract.

Round 3's driver bench was voided (BENCH_r03.json rc=124, parsed=null): an
unbounded backend-retry loop plus a print-only-at-the-end main() published
nothing when the external timeout fired. These tests pin the fix: exactly one
JSON line is printed on normal exit, on exceptions, and on SIGTERM; the
backend probe budget is bounded; results staged before a failure still get
published.

bench.py imports no jax at module level, so these tests stay cheap.
"""

import importlib.util
import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_once_prints_exactly_one_line(capsys):
    bench = _load_bench()
    bench.RESULT["value"] = 123.0
    bench._emit_once()
    bench._emit_once(error="second call must be ignored")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    parsed = json.loads(out[0])
    assert parsed["value"] == 123.0
    assert "error" not in parsed


def test_emit_once_error_paths(capsys):
    bench = _load_bench()
    bench._emit_once(error="backend unavailable")
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["value"] is None
    assert parsed["error"] == "backend unavailable"

    bench2 = _load_bench()
    bench2.RESULT["value"] = 7.0  # headline already staged -> partial note
    bench2._emit_once(error="train bench died")
    parsed2 = json.loads(capsys.readouterr().out.strip())
    assert parsed2["value"] == 7.0
    assert "error" not in parsed2
    assert parsed2["extras"]["partial"] == "train bench died"


def test_main_emits_json_when_everything_fails(capsys, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "bench_reference_torch",
                        lambda: (_ for _ in ()).throw(RuntimeError("no ref")))
    monkeypatch.setattr(bench, "bench_tpu",
                        lambda baseline: (_ for _ in ()).throw(
                            RuntimeError("relay down")))
    bench.main()
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] is None
    assert "relay down" in parsed["error"]
    assert parsed["metric"] == "grasp_candidates_scored_per_sec_750pt"


def test_main_publishes_staged_results_on_late_failure(capsys, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "bench_reference_torch", lambda: 86.0)

    def fake_tpu(baseline):
        bench.RESULT["value"] = 46000.0
        bench.RESULT["vs_baseline"] = round(46000.0 / baseline, 2)
        raise RuntimeError("train family crashed")

    monkeypatch.setattr(bench, "bench_tpu", fake_tpu)
    bench.main()
    parsed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert parsed["value"] == 46000.0
    assert parsed["vs_baseline"] == 534.88
    assert parsed["extras"]["reference_torch_cpu_candidates_per_sec"] == 86.0
    assert "train family crashed" in parsed["extras"]["partial"]


def test_backend_probe_budget_is_bounded(monkeypatch):
    bench = _load_bench()
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))

    probes = []

    class _FakeCompleted:
        stdout = ""  # probe subprocess produced no BACKEND= line

    def fake_run(cmd, **kw):
        probes.append(kw.get("timeout"))
        return _FakeCompleted()

    monkeypatch.setattr("subprocess.run", fake_run)
    with pytest.raises(RuntimeError, match="never initialized"):
        bench._wait_for_backend()
    # worst case: 3 probes x 60s timeout + 2 sleeps x 30s = 240s <= 4 min
    assert len(probes) == 3
    assert all(t <= 90 for t in probes)
    assert sum(sleeps) + sum(probes) <= 300


def test_sigterm_emits_staged_json():
    # the driver's `timeout` sends SIGTERM first; the handler must publish
    code = (
        "import importlib.util, os, signal, sys, time\n"
        f"spec = importlib.util.spec_from_file_location('b', {os.path.join(REPO, 'bench.py')!r})\n"
        "b = importlib.util.module_from_spec(spec); spec.loader.exec_module(b)\n"
        "b._install_emit_guards(600)\n"
        "b.RESULT['value'] = 42.0\n"
        "os.kill(os.getpid(), signal.SIGTERM)\n"
        "time.sleep(30)\n"  # never reached
    )
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=60)
    assert time.time() - t0 < 30
    parsed = json.loads(proc.stdout.strip().splitlines()[-1])
    assert parsed["value"] == 42.0
    assert "signal" in parsed["extras"]["partial"]
    assert proc.returncode == 0
