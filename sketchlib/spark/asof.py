"""As-of (nearest-timestamp) join — pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` semantics on Spark, without a range join.

Each left row picks the right row with the greatest ``on`` <=
left ``on`` (``direction="backward"``; ties on ``on`` match) or the
smallest ``on`` >= left ``on`` (``"forward"``), within the same
``by`` keys; no match -> NULL payload (left-outer semantics, row
count preserved).

Plan: the classic union-merge shape.  Both sides union into one frame
(right payload NULL on left rows and vice versa), one window per
``by`` key ordered by (``on``, side) carries the last non-null right
payload forward (``F.last(ignorenulls=True)`` over UNBOUNDED
PRECEDING..CURRENT ROW), then left rows are kept.  ONE shuffle on the
``by`` keys, per-key cost linear in that key's rows — no
``left.ts >= right.ts`` range join, which Catalyst would execute as a
per-key cartesian (quadratic on hot keys) unless it can range-bucket.
At equal ``on`` the right row sorts before the left row (side flag in
the ordering), which is exactly the inclusive-match rule.

Contracts: the right side must be unique per (``by``, ``on``) — with
duplicates "the" matched row is undefined in every engine; aggregate
first (the gate query does max-per-key-instant).  Right rows with
NULL ``on`` are dropped (a null instant can never be the nearest
one; and F.last(ignorenulls) would otherwise smear their payload
into real matches).  NULL ``by`` keys never match on either side
(SQL equality semantics, like DuckDB's ASOF JOIN ``ON`` clause —
NOT the partitionBy null-grouping rule).  Left rows with NULL
``on`` or NULL ``by`` keys survive with NULL payload, same as SQL
``>=``/``=`` never matching.  The matched right row travels as one
struct, so a legitimately-NULL payload field stays NULL instead of
inheriting an older row's value.

``tolerance`` (backward: left_on - matched_on <= tolerance; forward:
matched_on - left_on): timestamps compare in exact integer
epoch-microseconds with tolerance in SECONDS; numeric ``on`` in
column units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window

from sketchlib.spark.sessions import _TS_TYPES, epoch_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    matched_on_col: str | None = None,
) -> DataFrame:
    """Left-outer as-of join; output = left columns + right payload
    columns (+ ``matched_on_col`` carrying the matched right ``on``
    when requested).  Payload column names must not collide with
    left's."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    for k in by + [on]:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join column {k!r} missing from a side")
    payload = [c for c in right.columns if c not in set(by) | {on}]
    clash = sorted(set(payload) & set(left.columns))
    if clash:
        raise ValueError(f"right payload collides with left columns: {clash}")
    if not payload:
        raise ValueError("right side has no payload columns")

    mcol = matched_on_col or "__asof_matched"
    if mcol in left.columns or mcol in payload:
        raise ValueError(f"matched_on_col {mcol!r} collides")
    scratch = sorted({"__side", "__pay"} & set(left.columns))
    if scratch:
        raise ValueError(f"left columns collide with internals: {scratch}")
    if "__m" in payload:
        raise ValueError("right payload column '__m' collides with internals")

    # right rows that can never match are dropped up front: NULL
    # instant, or any NULL by key (SQL equality semantics -- NULL
    # never equals NULL; Window.partitionBy WOULD group them)
    r = right.filter(F.col(on).isNotNull())
    for k in by:
        r = r.filter(F.col(k).isNotNull())
    on_t = left.schema[on].dataType

    # the matched right row travels as ONE nullable struct so payload
    # and matched instant stay mutually consistent: per-column
    # last(ignorenulls) would smear an older row's value over a
    # legitimately-NULL payload field of the row that actually matched
    pay_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload]
        + [StructField("__m", right.schema[on].dataType)]
    )
    lrow = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_t).alias("__pay"),
    )
    rrow = r.select(
        *[
            F.col(c) if c in by or c == on
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c) for c in payload], F.col(on).alias("__m")
        ).alias("__pay"),
    )
    ordc = (
        [F.asc(on), F.asc("__side")]
        if direction == "backward"
        else [F.desc(on), F.asc("__side")]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*ordc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        lrow.unionByName(rrow)
        .withColumn("__pay", F.last("__pay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side")
        .withColumn(mcol, F.col("__pay")["__m"])
    )

    # left rows that can't legitimately match anything: NULL instant
    # (SQL >= never true) or NULL by key (equality never true) -- the
    # window would otherwise hand them whatever sorted adjacent
    keep = F.col(on).isNotNull()
    for k in by:
        keep = keep & F.col(k).isNotNull()
    if tolerance is not None:
        if isinstance(on_t, _TS_TYPES):
            lv, mv = epoch_micros(on, on_t), epoch_micros(mcol, on_t)
            tol = int(round(float(tolerance) * 1_000_000))
        else:
            lv, mv = F.col(on), F.col(mcol)
            tol = tolerance
        gap = (lv - mv) if direction == "backward" else (mv - lv)
        keep = keep & (gap <= F.lit(tol))
    for c in payload:
        out = out.withColumn(c, F.when(keep, F.col("__pay")[c]))
    out = out.withColumn(mcol, F.when(keep, F.col(mcol))).drop("__pay")
    if matched_on_col is None:
        out = out.drop(mcol)
    return out
