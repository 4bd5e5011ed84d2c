"""Guard the graded benchmark entry points: bench.py and __graft_entry__
must keep working on the CPU micro path regardless of library refactors
(the driver runs both on real hardware at round end)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cpu_micro_smoke():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["TWEEDIEMIX_BENCH_SEEDS"] = "0"  # latency-only: keep CI fast
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv=['bench.py'];"
        f"runpy.run_path(r'{os.path.join(REPO, 'bench.py')}', run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        cwd=REPO, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline",
            "vs_baseline_latency", "vs_baseline_throughput",
            "video_metric", "video_clip_s", "video_frames_per_s",
            "seg_metric", "seg_ms_per_concept"} <= set(rec)
    assert rec["value"] > 0
    assert rec["video_clip_s"] > 0
    assert rec["seg_ms_per_concept"] > 0


def test_bench_partial_emit_on_sigterm(capsys):
    """If the driver's timeout SIGTERMs bench.py mid-rider (video/seg each
    pay a minutes-long compile), the stages already measured must still be
    printed as one JSON line instead of losing the artifact."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    bench._result.update({"metric": "m", "value": 1.0, "unit": "u"})
    import pytest

    with pytest.raises(SystemExit):
        bench._emit_partial_and_exit(15, None)
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["partial"] is True and rec["metric"] == "m"


def test_entry_compiles():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        import jax

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == 1
    finally:
        sys.path.remove(REPO)


def test_bench_budget_skips_riders_with_reason():
    """With a zero wall-clock budget every rider must be skipped with a
    recorded reason (instead of the driver SIGKILLing mid-stage), while the
    image headline still lands and the artifact stays rc=0."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["TWEEDIEMIX_BENCH_SEEDS"] = "0"
    env["TWEEDIEMIX_BENCH_BUDGET_S"] = "0"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv=['bench.py'];"
        f"runpy.run_path(r'{os.path.join(REPO, 'bench.py')}', run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        cwd=REPO, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] > 0 and "partial" not in rec
    # default headline is int8-static, so the cross-mode rider is bf16;
    # since round 5 it is off by default (PERF carries the A/B) while
    # seg/video skip on the exhausted budget
    for rider in ("seg", "video"):
        assert "budget" in rec[f"{rider}_skipped"], rec
        assert f"{rider}_error" not in rec
    assert "off by default" in rec["bf16_skipped"], rec
    assert "bf16_error" not in rec
