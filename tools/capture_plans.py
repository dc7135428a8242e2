"""Capture .explain('formatted') for a set of declared queries into
plans/<outdir>/<name>_<tag>.txt.  For self-validating gates whose
returned frame is a tiny local relation, the returned-frame plan is
still captured (it documents that shape); the heavy internal frames of
such gates are covered by the operator-level plan notes in
OPTIMIZATION_r08.md.

Usage: python tools/capture_plans.py <repo_root> <outdir> <tag> <q1> <q2> ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root, outdir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)

from sketchlib.spark.session import get_spark  # noqa: E402

spark = get_spark(master="local[4]", app_name=f"plans-{tag}")
import __spark_entry__ as E  # noqa: E402

qs = E.queries()
os.makedirs(outdir, exist_ok=True)
for name in names:
    try:
        df = qs[name](
            spark,
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sf1.0_local"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{outdir}/{name}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"{name}: ok ({buf.getvalue().count('Exchange')} Exchange)")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {e}")
spark.stop()
