"""End-to-end test of bench.py's warm-worker delegation.

Starts a real tools/tpu_worker.py subprocess (forced onto the CPU
backend) polling a temp queue dir, then runs bench.py as a second
subprocess pointed at the same queue. bench.py must detect the worker
via the ping protocol, delegate the measurement, and mirror the
worker's JSON result lines to its own stdout — the exact path the
driver's benchmark capture exercises on real TPU.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(qdir):
    env = dict(os.environ)
    env.update(
        MRT_FORCE_CPU="1",
        TPU_WORKER_QUEUE=str(qdir),
        BENCH_RES="32x24",
        BENCH_TESS="2",
        BENCH_FWD_ONLY="1",
        BENCH_PING_S="120",
        BENCH_DEADLINE_S="400",
    )
    return env


def test_bench_delegates_to_worker(tmp_path):
    qdir = tmp_path / "q"
    qdir.mkdir()
    env = _env(qdir)
    worker = subprocess.Popen(
        [sys.executable, "tools/tpu_worker.py", str(qdir)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=420,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        assert lines, f"no JSON lines.\nstdout:{out.stdout}\nstderr:{out.stderr}"
        assert "delegating" in out.stderr, out.stderr
        last = json.loads(lines[-1])
        assert last["metric"] == "office_1080p_fwd_bwd_rays_per_s"
        assert last["stage"] == "fwd"
        assert last["value"] > 0
        assert last["fwd_rays_per_s"] > 0
    finally:
        (qdir / "STOP").write_text("")
        try:
            worker.wait(timeout=30)
        except subprocess.TimeoutExpired:
            worker.kill()


def test_bench_falls_back_without_worker(tmp_path, monkeypatch):
    """Empty queue dir + tiny ping timeout -> in-process fallback path
    is chosen (we only check the decision, not a full CPU measurement)."""
    import bench

    qdir = tmp_path / "q2"
    qdir.mkdir()
    monkeypatch.setenv("TPU_WORKER_QUEUE", str(qdir))
    monkeypatch.setenv("BENCH_PING_S", "2")
    assert bench._try_worker() is False
    # the withdrawn ping must not leave a queued job behind
    assert not list(qdir.glob("*.py"))


def test_bench_no_worker_env(monkeypatch):
    import bench

    monkeypatch.setenv("BENCH_NO_WORKER", "1")
    assert bench._try_worker() is False


def test_bench_fallback_runs_small_provisional_first(monkeypatch):
    """Without a worker, main() measures a small provisional resolution
    before the full-size programs (a cold remote-compile session may
    never finish the 1080p compile inside an external timeout)."""
    import bench

    calls = []
    monkeypatch.setenv("BENCH_NO_WORKER", "1")
    monkeypatch.delenv("BENCH_RES", raising=False)
    monkeypatch.delenv("BENCH_SMALL", raising=False)
    monkeypatch.setattr(bench, "_measure", lambda: calls.append(
        (os.environ.get("BENCH_RES"), os.environ.get("BENCH_PROVISIONAL"))))
    bench.main()
    assert calls == [("480x270", "1"), (None, None)]
