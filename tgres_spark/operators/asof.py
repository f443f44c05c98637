"""Backward as-of join — the time-series join Spark lacks natively.

The as-of join (pandas merge_asof, kdb+ aj, DuckDB/QuestDB ASOF JOIN)
attaches to each left row the latest right row at-or-before its
timestamp per key. tgres answers the same question inside one series
via its slot alignment (rrd/*.go); this is the general two-relation,
event-time form a training-data/metrics pipeline needs (enrich events
with the most recent config/model/price snapshot).

Spark-first plan — NOT a range join: union the two relations with a
side tag, ONE window per key over the merged time order, and
last(ignoreNulls) carries the latest right-side attributes forward
into each left row. One shuffle on the key, zero join fanout,
per-partition linear after the sort — where the naive
`t_r <= t_l` range join explodes per-key-quadratically and then
re-aggregates to pick the max. At equal timestamps the right row
sorts before the left row, so matching is INCLUSIVE
(t_right <= t_left) — exactly DuckDB's ASOF semantics, which is what
the registered oracle uses: this union+window plan is hash-checked
against DuckDB's native `ASOF LEFT JOIN`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    t: str,
    left_cols: list,
    right_cols: list,
) -> DataFrame:
    """Left as-of-backward join: (on, t, *left_cols, r_t, r_<c>...) —
    one output row per left row; r_* are NULL when the key has no
    right row at or before t. The right side must be unique per
    (on, t) (pre-aggregate with max_by/arg_max for determinism —
    within-window tie order between duplicate right rows is
    partition-layout-dependent otherwise)."""
    lp = left.select(
        F.col(on),
        F.col(t),
        F.lit(1).alias("__l"),
        *[F.col(c) for c in left_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right_cols
        ],
    )
    rp = right.select(
        F.col(on),
        F.col(t),
        F.lit(0).alias("__l"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        *[F.col(c) for c in right_cols],
    )
    u = lp.unionByName(rp)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(t).asc(), F.col("__l").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry the matched right row as ONE struct so matching is
    # row-atomic: DuckDB's ASOF attaches the whole latest-at-or-before
    # row, NULL attributes included. Independent per-column
    # last(ignoreNulls) would stitch a NULL attribute from an OLDER
    # right row while r_t comes from the newer one.
    rstruct = F.last(
        F.when(
            F.col("__l") == 0,
            F.struct(F.col(t).alias("t"), *[F.col(c) for c in right_cols]),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        u.select(
            on,
            t,
            "__l",
            *left_cols,
            rstruct.alias("__r"),
        )
        .where(F.col("__l") == 1)
        .select(
            on,
            t,
            *left_cols,
            F.col("__r.t").alias("r_t"),
            *[F.col(f"__r.{c}").alias(f"r_{c}") for c in right_cols],
        )
    )
