"""Populate the persistent compilation cache with the benchmark shapes.

Run once after code changes:  python tools/prewarm.py
bench.py then starts from a hot cache (tunnel compiles take minutes).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__":
    os.environ.setdefault("BENCH_TESS", os.environ.get("BENCH_TESS", "10"))
    import bench

    bench.main()
