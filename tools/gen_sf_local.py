"""Generate a LOCAL approximation of the driver's sf1.0 dataset for
measurement only (the driver generates its own sf1.0 at round end; the
r7 copy it left behind did not survive the sandbox reset).

Recipe: density scaling of sf0.1 (same spans, 10x rows/keys — verified
against sf0.01->sf0.1: identical time ranges, 10x user/cust/order key
spaces).  Value columns resample the empirical sf0.1 marginals (the
cross-column independence was verified: shipdate is independent of
orderdate); keys are regenerated contiguously; documents/embeddings are
regenerated from the observed recipe (31-word vocab, uniform 10..100
words, 0.16%% planted duplicate pairs; unit-normal 64-dim vectors with
1%% planted near-duplicates).  Row groups are capped at 1,048,576 rows
so lineitem gets 6 row groups — the same scan-task shape the driver's
sf1.0 produced (plans/r08/*_before.txt depend on it).

Usage: python tools/gen_sf_local.py [--out /root/sf1.0_local] [--mult 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 20260822
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ROW_GROUP = 1 << 20


def _resample(rng: np.random.Generator, col: np.ndarray, n: int) -> np.ndarray:
    return col[rng.integers(0, len(col), n)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/sf1.0_local")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    m = args.mult

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, f"{args.out}/{name}.parquet", row_group_size=ROW_GROUP)
        print(f"{name}: {table.num_rows} rows", flush=True)

    # Small dims: copy verbatim.
    for name in ("region", "nation"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{args.out}/{name}.parquet")
        print(f"{name}: copied", flush=True)

    src = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in ("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings")
    }

    # customer -----------------------------------------------------------
    c = src["customer"]
    n = c.num_rows * m
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000.0, 10000.0, n), 2)),
        "c_mktsegment": pa.array(_resample(rng, c.column("c_mktsegment").to_numpy(zero_copy_only=False), n)),
    }, schema=c.schema))

    # supplier -----------------------------------------------------------
    s = src["supplier"]
    n = s.num_rows * m
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
        "s_acctbal": pa.array(_resample(rng, s.column("s_acctbal").to_numpy(), n)),
    }, schema=s.schema))

    # part ---------------------------------------------------------------
    p = src["part"]
    n = p.num_rows * m
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
        "p_name": pa.array(_resample(rng, p.column("p_name").to_numpy(zero_copy_only=False), n)),
        "p_brand": pa.array(_resample(rng, p.column("p_brand").to_numpy(zero_copy_only=False), n)),
        "p_type": pa.array(_resample(rng, p.column("p_type").to_numpy(zero_copy_only=False), n)),
        "p_size": pa.array(rng.integers(1, 51, n).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900.0, 1000.0, n), 2)),
    }, schema=p.schema))

    # orders -------------------------------------------------------------
    o = src["orders"]
    n = o.num_rows * m
    n_cust = src["customer"].num_rows * m
    d0 = np.datetime64("1995-01-01")
    d1 = np.datetime64("2001-08-01")
    days = (d1 - d0).astype("timedelta64[D]").astype(int) + 1
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n).astype(np.int64)),
        "o_orderstatus": pa.array(_resample(rng, o.column("o_orderstatus").to_numpy(zero_copy_only=False), n)),
        "o_totalprice": pa.array(np.round(rng.uniform(1000.0, 500000.0, n), 2)),
        "o_orderdate": pa.array((d0 + rng.integers(0, days, n).astype("timedelta64[D]")).astype("datetime64[us]")),
        "o_orderpriority": pa.array(_resample(rng, o.column("o_orderpriority").to_numpy(zero_copy_only=False), n)),
    }, schema=o.schema))

    # lineitem -----------------------------------------------------------
    li = src["lineitem"]
    n = li.num_rows * m
    n_ord = src["orders"].num_rows * m
    n_part = src["part"].num_rows * m
    n_supp = src["supplier"].num_rows * m
    s0 = np.datetime64("1995-01-02")
    s1 = np.datetime64("2001-11-04")
    sdays = (s1 - s0).astype("timedelta64[D]").astype(int) + 1
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, n_part, n).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n).astype(np.int64)),
        "l_linenumber": pa.array(_resample(rng, li.column("l_linenumber").to_numpy(), n)),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900.0, 105000.0, n), 2)),
        "l_discount": pa.array(rng.integers(0, 11, n) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, n) / 100.0),
        "l_returnflag": pa.array(_resample(rng, li.column("l_returnflag").to_numpy(zero_copy_only=False), n)),
        "l_linestatus": pa.array(_resample(rng, li.column("l_linestatus").to_numpy(zero_copy_only=False), n)),
        "l_shipdate": pa.array((s0 + rng.integers(0, sdays, n).astype("timedelta64[D]")).astype("datetime64[us]")),
    }, schema=li.schema))

    # events -------------------------------------------------------------
    ev = src["events"]
    n = ev.num_rows * m
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    t1 = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)
    ts = np.sort(rng.integers(t0, t1, n))
    write("events", pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, 1500 * m, n).astype(np.int64)),
        "event_type": pa.array(_resample(rng, ev.column("event_type").to_numpy(zero_copy_only=False), n)),
        "value": pa.array(np.round(rng.exponential(50.0, n), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    }, schema=ev.schema))

    # documents ----------------------------------------------------------
    doc = src["documents"]
    n = doc.num_rows * m
    counts = rng.integers(10, 101, n)
    flat = rng.integers(0, len(VOCAB), int(counts.sum()))
    vocab = np.array(VOCAB)
    texts: list[str] = []
    pos = 0
    for cnt in counts:
        texts.append(" ".join(vocab[flat[pos:pos + cnt]]))
        pos += cnt
    # plant exact-duplicate pairs at the observed 0.16% rate
    n_dup = max(1, int(0.0016 * n))
    dsts = rng.choice(n, size=2 * n_dup, replace=False)
    for a, b in zip(dsts[:n_dup], dsts[n_dup:]):
        texts[b] = texts[a]
    langs = rng.choice(np.array(["en", "zh", "es", "fr", "de"]), size=n,
                       p=[0.412, 0.148, 0.148, 0.148, 0.144])
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }, schema=doc.schema))

    # embeddings ---------------------------------------------------------
    em = src["embeddings"]
    n = em.num_rows * m
    M = rng.standard_normal((n, 64)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    n_near = max(1, n // 100)
    src_i = rng.choice(n // 2, size=n_near, replace=False)
    dst_i = n // 2 + rng.choice(n - n // 2, size=n_near, replace=False)
    M[dst_i] = M[src_i] + 0.01 * rng.standard_normal((n_near, 64)).astype(np.float32)
    M[dst_i] /= np.linalg.norm(M[dst_i], axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype(np.int32)),
    }, schema=em.schema))


if __name__ == "__main__":
    main()
