"""Driver-harness contract test.

The driver's correctness harness canonicalizes every gate query's
output with pandas — ``sort_values`` over all columns followed by a
value hash — which CRASHES on any unhashable/unsortable dtype (list,
dict, ndarray cells).  That class of red row (r5's
``materialize_packed``) is invisible to the oracle gate because DuckDB
compares fine; it only explodes inside the driver.  This test runs the
driver's exact canonicalization recipe over EVERY ``queries()`` output
at sf0.001, so an incompatible output schema fails at birth, in CI,
instead of burning a driver round.
"""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entry.queries()


def _driver_canon(pdf: pd.DataFrame) -> int:
    """The driver's canonicalization: columns sorted by name, rows
    sorted by all columns, then a value hash.  Any unhashable cell
    raises — exactly the failure mode this test exists to catch."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(cols).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_gate_output_is_driver_canonicalizable(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    pdf = df.toPandas()
    # must not raise; the hash value itself is irrelevant here
    _driver_canon(pdf)
    # and every column dtype must be scalar-hashable explicitly, so a
    # single-row result (sort_values no-op) can't hide a list column
    for col in pdf.columns:
        bad = pdf[col].map(lambda v: isinstance(v, (list, dict, set)))
        assert not bad.any(), (
            f"{name}.{col} holds unhashable values — the driver "
            "canonicalizer will crash; fingerprint it to a scalar "
            "(md5/xxhash64 of to_json) in the gate query"
        )


def test_every_query_has_oracle_or_documented_exception():
    """Each gate should carry a DuckDB oracle; the known exceptions are
    the constant-shape/streaming/non-SQL gates, listed explicitly so a
    new oracle-less gate is a conscious decision."""
    oracles = entry.oracle_sql()
    missing = set(_QUERIES) - set(oracles)
    assert missing == set(), f"queries without oracle_sql: {missing}"
