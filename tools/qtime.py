"""Time individual declared queries exactly as bench.py does (build +
count, best-of-N in one warm session).  Measurement helper only —
bench.py stays the frozen driver contract.

Usage: python tools/qtime.py <query> [<query> ...] [--sf-dir DIR]
       [--passes N] [--cpus N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry

    spark = bench._spark(f"local[{args.cpus}]", "qtime")
    qs = entry.queries()
    bench._warmup(spark)
    best: dict[str, float] = {}
    for p in range(args.passes):
        for name in args.names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            n = df.count()
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, 1e9), dt)
            print(f"pass{p} {name}: {dt:.3f}s rows={n}", flush=True)
    for name, t in best.items():
        print(f"BEST {name}: {t:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
