"""Headline benchmark: Office 1920x1080 @1spp, forward + backward.

Prints JSON result lines to stdout, one at a time, each a complete
superset of the previous — **the last complete JSON line wins**. The
first line is flushed as soon as the first forward measurement exists,
so even a hard external timeout still leaves a parseable number:

  {"metric": "office_1080p_fwd_bwd_rays_per_s", "value": N,
   "unit": "rays/s/chip", "vs_baseline": N, ...extras}

While only the forward has been measured, `value` carries the forward
throughput and `"stage": "fwd"` marks it provisional; once fwd+bwd is
measured the final line reports the real headline metric
(`"stage": "fwd_bwd"`).

vs_baseline is measured against the reference renderer's published
Office number — 5.3 s for 1920x1080 @1spp (/root/reference/README.md:10,
BASELINE.md) i.e. ~0.391 Mray/s — which is *forward only*; the final
line holds forward+backward against it.

The remote-TPU compile service takes minutes per program and its latency
is unpredictable, so the benchmark time-boxes itself: at
BENCH_DEADLINE_S (default 3000 s) it prints the best result so far and
exits 0.

If a warm TPU worker (tools/tpu_worker.py) is polling its queue dir, the
measurement is delegated to it: the remote compile service charges
~15-20 min of session setup to the first compile of every NEW process,
but compiles inside the already-warm worker take seconds. The parent
then just mirrors the worker's JSON lines to stdout. Without a worker it
falls back to measuring in-process.

Env knobs:
  BENCH_TESS        office tessellation level (default 10)
  BENCH_SMALL       set to 1 for a fast smoke run (480x270)
  BENCH_RES         explicit "WxH" resolution override (testing)
  BENCH_DEADLINE_S  wall-clock self-deadline in seconds (default 3000)
  BENCH_FWD_ONLY    set to 1 to skip the fwd+bwd program
  BENCH_NO_AA       set to 1 to skip the AA-included stage
  BENCH_NO_WORKER   set to 1 to skip worker delegation
  BENCH_PING_S      worker liveness-ping timeout (default 120)
  TPU_WORKER_QUEUE  worker queue dir (default /tmp/tpuq)
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_S = 5.3  # reference office 1920x1080 (README.md:10)

_state: dict = {}


def _emit() -> None:
    """Write the current best result as one flushed JSON line."""
    if _state.get("result"):
        out = _state.get("sink") or sys.stdout
        out.write(json.dumps(_state["result"]) + "\n")
        out.flush()


def _deadline_handler(signum, frame):
    sys.stderr.write("bench: deadline reached, emitting best-so-far\n")
    sys.stderr.flush()
    _emit()
    os._exit(0)


def _resolution() -> tuple[int, int]:
    if os.environ.get("BENCH_RES"):
        w, h = os.environ["BENCH_RES"].split("x")
        return int(w), int(h)
    if os.environ.get("BENCH_SMALL") == "1":
        return 480, 270
    return 1920, 1080


def _try_worker() -> bool:
    """Run the measurement inside a warm tools/tpu_worker.py process.

    Returns True iff delegation happened and its JSON lines were
    mirrored to stdout (each mirrored line also updates _state so the
    deadline handler re-emits the newest one). False -> caller should
    measure in-process.
    """
    if os.environ.get("BENCH_NO_WORKER") == "1":
        return False
    qdir = os.environ.get("TPU_WORKER_QUEUE", "/tmp/tpuq")
    if not os.path.isdir(qdir):
        return False
    tag = f"{os.getpid()}_{int(time.time())}"
    ping_s = float(os.environ.get("BENCH_PING_S", "120"))

    # liveness ping: the worker should turn this into a marker file
    marker = os.path.join(qdir, f"00_ping_{tag}.pong")
    ping = os.path.join(qdir, f"00_ping_{tag}.py")
    with open(ping, "w") as f:
        f.write(f"open({marker!r}, 'w').write('pong')\n")
    t0 = time.time()
    while not os.path.exists(marker):
        if time.time() - t0 > ping_s:
            try:  # dead or wedged worker: withdraw the ping if still queued
                os.remove(ping)
            except OSError:
                pass
            sys.stderr.write("bench: no worker pong, measuring in-process\n")
            return False
        time.sleep(1.0)
    for p in (marker, ping[:-3] + ".done", ping[:-3] + ".out"):
        try:
            os.remove(p)
        except OSError:
            pass
    sys.stderr.write(f"bench: warm worker answered in {time.time()-t0:.1f}s, "
                     f"delegating\n")
    sys.stderr.flush()

    repo = os.path.dirname(os.path.abspath(__file__))
    result_path = os.path.join(qdir, f"01_bench_{tag}.jsonl")
    # MRT_* knobs must ride along or knob sweeps through bench silently
    # measure the defaults (the worker restores its env between jobs)
    passthrough = {k: v for k, v in os.environ.items()
                   if k.startswith("BENCH_") or k.startswith("MRT_")}
    job = os.path.join(qdir, f"01_bench_{tag}.py")
    with open(job + ".tmp", "w") as f:
        f.write(
            "import os, sys\n"
            f"os.environ.update({passthrough!r})\n"
            f"sys.path.insert(0, {repo!r})\n"
            "# drop stale module state so the worker runs CURRENT code\n"
            "for m in [m for m in list(sys.modules)\n"
            "          if m == 'bench' or m.startswith('myraytracer_tpu')]:\n"
            "    del sys.modules[m]\n"
            "import bench\n"
            f"bench.worker_main({result_path!r})\n"
        )
    os.replace(job + ".tmp", job)  # atomic: worker never sees a partial file

    # mirror the worker's result lines until the job completes
    done = job[:-3] + ".done"
    pos = 0
    while True:
        if os.path.exists(result_path):
            with open(result_path) as f:
                f.seek(pos)
                chunk = f.read()
            # only consume complete lines
            complete = chunk.rfind("\n")
            if complete >= 0:
                pos += complete + 1
                for line in chunk[:complete].splitlines():
                    line = line.strip()
                    if line:
                        try:
                            _state["result"] = json.loads(line)
                        except ValueError:
                            continue
                        print(line, flush=True)
        if os.path.exists(done):
            out = job[:-3] + ".out"
            if os.path.exists(out):
                with open(out) as f:
                    head = f.readline()
                sys.stderr.write(f"bench: worker job finished: {head}")
            return True
        time.sleep(1.0)


def worker_main(result_path: str) -> None:
    """Entry point when exec'd inside the TPU worker process."""
    with open(result_path, "a") as sink:
        _state["sink"] = sink
        _state["result"] = None
        try:
            _measure()
        finally:
            _state.pop("sink", None)


def main() -> None:
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "3000"))
    signal.signal(signal.SIGALRM, _deadline_handler)
    signal.alarm(max(1, int(deadline)))
    if _try_worker():
        return
    # In-process fallback: every compile goes through the cold remote
    # service (~15-20 min session setup on the first one), so secure a
    # real provisional number from a small render before attempting the
    # full-resolution programs.
    if (os.environ.get("BENCH_SMALL_FIRST", "1") == "1"
            and not os.environ.get("BENCH_RES")
            and os.environ.get("BENCH_SMALL") != "1"):
        os.environ["BENCH_RES"] = "480x270"
        os.environ["BENCH_PROVISIONAL"] = "1"
        try:
            _measure()
        finally:
            del os.environ["BENCH_RES"]
            del os.environ["BENCH_PROVISIONAL"]
    _measure()


def _measure() -> None:
    t_start = time.perf_counter()
    tess = int(os.environ.get("BENCH_TESS", "10"))
    width, height = _resolution()

    import jax

    if os.environ.get("MRT_FORCE_CPU") == "1":
        # env JAX_PLATFORMS is overridden by the axon sitecustomize;
        # the config update is the reliable in-process switch
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from myraytracer_tpu.ops.render import render, render_loss_grad_image
    from myraytracer_tpu.scenes.golden import scene_08_office

    dev = jax.devices()[0]
    sc = scene_08_office(tess=tess, resolution=(width, height))
    t0 = time.perf_counter()
    scene = sc.build()
    build_s = time.perf_counter() - t0
    sys.stderr.write(f"bench: scene built in {build_s:.1f}s "
                     f"({int(scene.n_tris)} tris)\n")
    sys.stderr.flush()

    n_rays = width * height
    target = jnp.zeros((height, width, 3), jnp.float32)
    baseline_rays_per_s = (1920 * 1080) / BASELINE_S

    def sync(x):
        # block_until_ready is a no-op under the remote-TPU tunnel;
        # fetching a scalar reduction forces completion.
        return float(jnp.asarray(jax.tree.leaves(x)[0]).sum())

    result = {
        "metric": "office_1080p_fwd_bwd_rays_per_s",
        "value": 0.0,
        "unit": "rays/s/chip",
        "vs_baseline": 0.0,
        "stage": "compiling",
        "resolution": f"{width}x{height}",
        "n_tris": int(scene.n_tris),
        "bvh_nodes": int(scene.n_nodes),
        "scene_build_s": round(build_s, 3),
        "device": str(dev),
    }
    if os.environ.get("BENCH_PROVISIONAL") == "1":
        # small-render stand-in emitted before the full-size programs
        # compile; any later full-size line supersedes it
        result["provisional_small"] = True
    _state["result"] = result
    _emit()  # a parseable line exists from the first moment

    # Kick off the fwd+bwd compile in a background thread so the two
    # remote compiles overlap (the compile service dominates wall time);
    # if the service serializes them nothing is lost.
    fb_compiled = {}
    fb_done = None
    if os.environ.get("BENCH_FWD_ONLY") != "1":
        import threading

        fb_done = threading.Event()

        def _compile_fb():
            t0 = time.perf_counter()
            try:
                fb_compiled["exe"] = (
                    render_loss_grad_image.lower(scene, sc.camera, target)
                    .compile())
                fb_compiled["s"] = time.perf_counter() - t0
            except Exception as e:  # fall back to plain jit call later
                fb_compiled["err"] = f"{type(e).__name__}: {e}"
            sys.stderr.write(
                f"bench: fwd+bwd AOT compile finished in "
                f"{time.perf_counter() - t0:.1f}s "
                f"({'ok' if 'exe' in fb_compiled else fb_compiled.get('err')})\n")
            sys.stderr.flush()
            fb_done.set()

        threading.Thread(target=_compile_fb, daemon=True).start()

    # ---- forward: compile, then emit a line after EVERY timed run ----
    t0 = time.perf_counter()
    img = render(scene, sc.camera)
    sync(img)
    fwd_compile_s = time.perf_counter() - t0
    result["fwd_compile_s"] = round(fwd_compile_s, 1)
    sys.stderr.write(f"bench: fwd compiled+ran in {fwd_compile_s:.1f}s\n")
    sys.stderr.flush()

    fwd_times = []
    for i in range(3):
        t0 = time.perf_counter()
        img = render(scene, sc.camera)
        sync(img)
        fwd_times.append(time.perf_counter() - t0)
        fwd_s = min(fwd_times)
        # provisional: value = forward throughput until fwd+bwd exists
        result.update(
            stage="fwd",
            value=round(n_rays / fwd_s, 1),
            vs_baseline=round((n_rays / fwd_s) / baseline_rays_per_s, 3),
            fwd_rays_per_s=round(n_rays / fwd_s, 1),
            fwd_s=round(fwd_s, 4),
        )
        _emit()

    # steady-state (pipelined) throughput: N dispatches, one sync. Every
    # single-call wall time above bills a fixed ~28 ms host<->device
    # round trip through the remote-TPU tunnel (measured: a trivial
    # jitted x+1 syncs in 27.3 ms); the reference's 5.31 s was
    # DEVICE-side kernel timing around a local launch
    # (/root/reference/mytracer_gpu.cu:78-81), so the pipelined number
    # is the closer apples-to-apples device-throughput comparison. The
    # headline `value` stays the conservative single-call wall time.
    NPIPE = 5

    def pipelined(fn, sync_last):
        # min over batches: a loaded host can starve the async dispatch
        # queue and make one batch read dispatch gaps, not device time
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(NPIPE):
                out = fn()
            sync_last(out)
            dt = (time.perf_counter() - t0) / NPIPE
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    result["fwd_s_pipelined"] = pipelined(
        lambda: render(scene, sc.camera), sync)
    _emit()

    if os.environ.get("BENCH_FWD_ONLY") == "1":
        return

    # ---- forward + backward (the headline metric) ----
    # the background AOT compile started before the fwd compile, so
    # waiting on it always beats starting a fresh compile here
    if fb_done is not None:
        fb_done.wait()

    def run_fb():
        if "exe" in fb_compiled:
            return fb_compiled["exe"](scene, sc.camera, target)
        return render_loss_grad_image(scene, sc.camera, target)

    t0 = time.perf_counter()
    loss, grads = run_fb()
    sync(loss)
    sync(grads)
    bwd_compile_s = time.perf_counter() - t0
    result["bwd_compile_s"] = round(bwd_compile_s, 1)
    sys.stderr.write(f"bench: fwd+bwd compiled+ran in {bwd_compile_s:.1f}s\n")
    sys.stderr.flush()

    fb_times = []
    for i in range(3):
        t0 = time.perf_counter()
        loss, grads = run_fb()
        # ONE combined scalar fetch: each sync is a host<->device round
        # trip through the tunnel (~10-25 ms), so syncing loss and grads
        # separately would bill a second round trip to the program time
        sync(loss + jnp.asarray(jax.tree.leaves(grads)[0]).sum())
        fb_times.append(time.perf_counter() - t0)
        fwd_bwd_s = min(fb_times)
        result.update(
            stage="fwd_bwd",
            value=round(n_rays / fwd_bwd_s, 1),
            vs_baseline=round(
                (n_rays / fwd_bwd_s) / baseline_rays_per_s, 3),
            fwd_bwd_s=round(fwd_bwd_s, 4),
            loss_finite=bool(np.isfinite(float(loss))),
            total_wall_s=round(time.perf_counter() - t_start, 1),
        )
        _emit()

    # pipelined fwd+bwd (see fwd_s_pipelined comment)
    result["fwd_bwd_s_pipelined"] = pipelined(
        run_fb,
        lambda lg: sync(lg[0] + jnp.asarray(jax.tree.leaves(lg[1])[0]).sum()))
    _emit()

    # ---- AA-included forward (apples-to-apples vs the reference GPU) --
    # The reference's 5.31 s GPU number ALWAYS includes its adaptive-
    # supersampling second kernel (/root/reference/mytracer_gpu.cu:83-109),
    # so this stage measures render + the same AA rule (render_aa). The
    # compaction budget is SIZED FROM THE MEASURED pass-1 deviation at
    # this resolution (the golden budgets are calibrated for the 500x500
    # goldens; at 1080p only ~2.8%% of office pixels exceed the 0.02
    # threshold): budget = measured fraction x 1.3 margin, rounded up to
    # 0.005 — always >= the reference's exact above-threshold set, which
    # is what test_aa_budget.py enforces for the goldens.
    if os.environ.get("BENCH_NO_AA") != "1":
        import math

        from myraytracer_tpu.ops.render import AA_THRESHOLD, _deviation, render_aa

        img1 = render(scene, sc.camera)
        frac = float((jnp.asarray(_deviation(img1)) > AA_THRESHOLD).mean())
        # the deviation map is deterministic for a fixed scene+resolution,
        # so the margin only covers fp noise across runs — 10% is plenty
        aa_budget = max(0.01, math.ceil(frac * 1.1 / 0.0025) * 0.0025)
        result["aa_budget"] = aa_budget
        sys.stderr.write(
            f"bench: AA above-threshold frac {frac:.4f} -> budget {aa_budget}\n")
        baseline_aa_rays_per_s = (1920 * 1080) / 5.31  # README.md:11

        t0 = time.perf_counter()
        img = render_aa(scene, sc.camera, budget_frac=aa_budget)
        sync(img)
        result["aa_compile_s"] = round(time.perf_counter() - t0, 1)
        sys.stderr.write(
            f"bench: AA compiled+ran in {result['aa_compile_s']:.1f}s\n")
        sys.stderr.flush()
        aa_times = []
        for i in range(3):
            t0 = time.perf_counter()
            img = render_aa(scene, sc.camera, budget_frac=aa_budget)
            sync(img)
            aa_times.append(time.perf_counter() - t0)
            aa_s = min(aa_times)
            result.update(
                aa_s=round(aa_s, 4),
                aa_rays_per_s=round(n_rays / aa_s, 1),
                aa_vs_baseline=round(
                    (n_rays / aa_s) / baseline_aa_rays_per_s, 3),
                total_wall_s=round(time.perf_counter() - t_start, 1),
            )
            _emit()

        # pipelined render+AA (see fwd_s_pipelined comment)
        result["aa_s_pipelined"] = pipelined(
            lambda: render_aa(scene, sc.camera, budget_frac=aa_budget),
            sync)
        result["total_wall_s"] = round(time.perf_counter() - t_start, 1)
        _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit best-so-far even on failure
        sys.stderr.write(f"bench: error: {type(e).__name__}: {e}\n")
        sys.stderr.flush()
        _emit()
        raise
