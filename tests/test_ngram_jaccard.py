"""Exact n-gram Jaccard near-dup pairs: python-recompute oracle,
index/prefix/hash plan equivalence, edge cases, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.dedup.ngram import ngram_jaccard_pairs

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
]


def _mk_docs(n=50, seed=11):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        words = rng.choice(WORDS, size=int(rng.integers(20, 40)), replace=True)
        docs.append((i, " ".join(words)))
    # near-dups: drop every 15th word of docs 0..9 (3-gram Jaccard
    # lands 0.72-0.86 on this seed — all above the 0.5 threshold)
    for i in range(10):
        ws = docs[i][1].split(" ")
        docs.append((1000 + i, " ".join(w for j, w in enumerate(ws) if j % 15 != 14)))
    # one exact duplicate
    docs.append((2000, docs[12][1]))
    return docs


def _py_pairs(docs, w, t):
    """Driver-side oracle: distinct w-gram sets, all-pairs Jaccard."""
    sets = {}
    for i, text in docs:
        ws = text.split(" ")
        sets[i] = {" ".join(ws[j : j + w]) for j in range(len(ws) - w + 1)}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            jac = inter / (len(sets[a]) + len(sets[b]) - inter)
            if jac >= t:
                out[(a, b)] = jac
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_mk_docs(), "doc_id long, text string")


@pytest.mark.parametrize("method", ["index", "prefix"])
def test_matches_python_oracle(spark, docs_df, method):
    t = 0.5
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, w=3, threshold=t, method=method).collect()
    }
    want = _py_pairs(_mk_docs(), 3, t)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # the injected structure is actually found
    assert (12, 2000) in got and got[(12, 2000)] == 1.0
    assert sum(1 for a, b in got if b == a + 1000) == 10


def test_hash_grams_identical(spark, docs_df):
    plain = ngram_jaccard_pairs(docs_df, w=3, threshold=0.5, method="prefix")
    # hashed side also exercises the cache=False (no-persist) path
    hashed = ngram_jaccard_pairs(
        docs_df, w=3, threshold=0.5, method="prefix", hash_grams=True,
        cache=False,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, hashed.collect()))


def test_auto_gate_transparent(spark, docs_df):
    # auto picks a plan; whatever it picks must equal the forced plans
    auto = sorted(map(tuple, ngram_jaccard_pairs(docs_df, threshold=0.6).collect()))
    idx = sorted(
        map(tuple, ngram_jaccard_pairs(docs_df, threshold=0.6, method="index").collect())
    )
    assert auto == idx


def test_short_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (None, "x y z w x y z w"), (3, "x y z w x y z w")],
        "doc_id long, text string",
    )
    # <w words -> empty gram set -> never pairs; NULL id excluded
    assert ngram_jaccard_pairs(df, w=3, threshold=0.1).count() == 0


def test_threshold_one_exact_dups_only(spark, docs_df):
    got = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs_df, w=3, threshold=1.0, method="prefix").collect()
    }
    want = {k for k, v in _py_pairs(_mk_docs(), 3, 1.0).items() if v == 1.0}
    assert got == want and (12, 2000) in got


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="threshold"):
        ngram_jaccard_pairs(docs_df, threshold=0.0)
    with pytest.raises(ValueError, match="method"):
        ngram_jaccard_pairs(docs_df, method="lsh")


def test_no_python_nodes(spark, docs_df):
    # the whole operator is Catalyst: no Arrow/Python eval in any plan
    for m in ("index", "prefix"):
        plan = ngram_jaccard_pairs(docs_df, method=m)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
