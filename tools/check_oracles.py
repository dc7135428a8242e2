"""Local simulation of the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB at a given sf,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from sketchlib.spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 4)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
            if name not in oracles:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            sn = normalize(srows, scols)
            on = normalize(orows, ocols)
            ok_cols = sorted(scols) == sorted(ocols)
            ok_rows = len(sn) == len(on)
            ok_vals = sn == on
            status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
                print(f"{name}: {status} cols={ok_cols} rows={ok_rows} vals={ok_vals}")
                print("  spark cols:", sorted(scols), "oracle cols:", sorted(ocols))
                for a, b in list(zip(sn, on))[:6]:
                    if a != b:
                        print("   spark:", a, " oracle:", b)
                if len(sn) != len(on):
                    print(f"   spark {len(sn)} rows vs oracle {len(on)} rows")
            else:
                print(f"{name}: OK ({len(sn)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if main(sf, only=sys.argv[2:] or None) else 0)
