"""Persistent TPU experiment worker.

The remote compile service charges ~15-20 min of session setup to the
FIRST compile in each process, then compiles take seconds. This worker
pays that cost once and then polls a queue directory for experiment
snippets, exec'ing each in-process so every later compile is cheap.

Usage:
  python tools/tpu_worker.py [queue_dir]      # default /tmp/tpuq

Protocol: drop `NN_name.py` into the queue dir; the worker runs files in
sorted order, writes stdout+stderr+traceback to `NN_name.out`, and
renames the input to `NN_name.done`. Drop a file named `STOP` to exit.
Snippets run with globals {jax, jnp, np, WORK: dict persisting across
snippets} plus repo root on sys.path.
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    qdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq"
    os.makedirs(qdir, exist_ok=True)

    import jax

    if os.environ.get("MRT_FORCE_CPU") == "1":
        # env JAX_PLATFORMS is overridden by the axon sitecustomize;
        # the config update is the reliable in-process switch (tests)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    print(f"worker: devices={jax.devices()}", flush=True)
    t0 = time.time()
    # warm the compile-service session with a trivial program
    x = jnp.arange(128.0)
    float((x * 2 + 1).sum())
    print(f"worker: session warm in {time.time() - t0:.1f}s; "
          f"polling {qdir}", flush=True)

    work: dict = {}
    glb = {"jax": jax, "jnp": jnp, "np": np, "WORK": work,
           "__name__": "__tpu_worker__"}

    # env snapshot: snippets commonly set MRT_*/BENCH_* tuning knobs via
    # os.environ; restoring the startup environment between jobs keeps one
    # experiment's knobs from silently contaminating every later
    # measurement in this long-lived process (this exact leak skewed a
    # round-2 session's numbers by ~15%)
    env0 = dict(os.environ)

    while True:
        if os.path.exists(os.path.join(qdir, "STOP")):
            print("worker: STOP seen, exiting", flush=True)
            return
        jobs = sorted(f for f in os.listdir(qdir) if f.endswith(".py"))
        if not jobs:
            time.sleep(2.0)
            continue
        job = jobs[0]
        path = os.path.join(qdir, job)
        out_path = path[:-3] + ".out"
        buf = io.StringIO()
        t0 = time.time()
        print(f"worker: running {job}", flush=True)
        try:
            with open(path) as f:
                src = f.read()
            # drop cached repo modules so edits between jobs take effect
            # (a stale myraytracer_tpu once made an A/B measure the SAME
            # code twice); jax stays cached so compiles remain warm
            for m in [k for k in sys.modules if k.startswith("myraytracer_tpu")]:
                del sys.modules[m]
            with redirect_stdout(buf), redirect_stderr(buf):
                exec(compile(src, path, "exec"), glb)
            status = "ok"
        except BaseException:
            buf.write("\n" + traceback.format_exc())
            status = "error"
        finally:
            os.environ.clear()
            os.environ.update(env0)
        dt = time.time() - t0
        with open(out_path, "w") as f:
            f.write(f"# status={status} wall={dt:.2f}s\n")
            f.write(buf.getvalue())
        os.rename(path, path[:-3] + ".done")
        print(f"worker: {job} {status} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
