"""Statsd packet source: ``name:value|type[|@sample]``.

Reference: statsd/statsd.go ParseStatsdPacket (statsd.go:72-118):
- bare ``name`` → counter add of 1
- ``|c`` counter (value scaled by 1/sample), ``|g`` gauge
  (leading +/- → delta), ``|ms`` timer
- ``@sample`` must be in [0, 1]; invalid packets are rejected

Pure column expressions; one regex extract per field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import sanitize_name, sanitize_name_sql

# Java-regex (Spark) validation uses possessive quantifiers — no
# backtracking; the DuckDB oracle keeps the plain form (RE2 is linear).
_RX = r"^([^:]++):([+-]?+[0-9.]++)\|(c|g|ms)(\|@([0-9.]++))?+$"
_RX_RE2 = r"^([^:]+):([+-]?[0-9.]+)\|(c|g|ms)(\|@([0-9.]+))?$"


def parse_statsd_packets(pk: DataFrame, col: str = "packet") -> DataFrame:
    """packets(col) → (name, value, metric, sample, delta).

    Output mirrors statsd.Stat; timestamps ride alongside if the input
    has a ``t`` column (the reference stamps at receive time).
    """
    keep = [f for f in pk.columns if f != col]
    # trim ONCE in a pre-projection (optimization round 13): the trim
    # fed four separate expressions (validation rlike + both splits'
    # inputs) and expression trees get no CSE across select-list
    # entries, so each row paid the whitespace scan repeatedly.
    pk = pk.select(F.trim(F.col(col)).alias(col), *keep)
    c = F.col(col)
    # one rlike validates the grammar; splits extract the fields —
    # 5 regexp_extracts over the same pattern cost ~5x (no CSE across
    # separate expressions in codegen). Name = everything before the
    # FIRST ':' (the grammar's [^:]+); only the remainder splits on
    # '|', so names containing '|' (legal per the pattern) parse the
    # same here as in the regexp_extract oracle.
    head = F.split(c, ":", 2)
    rest = F.split(F.element_at(head, 2), r"\|")
    valid = c.rlike(_RX)
    value_s = F.element_at(rest, 1)
    sample_s = F.when(F.size(rest) >= 3, F.element_at(rest, 3))
    out = pk.where(valid).select(
        *keep,
        sanitize_name(F.element_at(head, 1)).alias("name"),
        value_s.try_cast("double").alias("value"),
        F.element_at(rest, 2).alias("metric"),
        F.coalesce(
            F.substring(sample_s, 2, 64).try_cast("double"),
            F.lit(1.0),
        ).alias("sample"),
        # first-char test instead of a per-row ^[+-] regex — exactly
        # the same predicate (r13 micro-opt; the oracle keeps its
        # regexp_matches form, the boolean is identical)
        F.substring(value_s, 1, 1).isin("+", "-").alias("delta"),
    )
    return out.where(
        F.col("value").isNotNull()
        & (F.col("sample") >= 0.0)
        & (F.col("sample") <= 1.0)
    )


def parse_statsd_packets_sql(pk_sql: str, col: str = "packet", extra: str = "t") -> str:
    rx = _RX_RE2
    extract1 = f"regexp_extract(trim({col}), '{rx}', 1)"
    inner = (
        f"SELECT {extra}, "
        f"NULLIF({sanitize_name_sql(extract1)}, '') AS name, "
        f"TRY_CAST(NULLIF(regexp_extract(trim({col}), '{rx}', 2), '') AS DOUBLE) AS value, "
        f"NULLIF(regexp_extract(trim({col}), '{rx}', 3), '') AS metric, "
        f"COALESCE(TRY_CAST(NULLIF(regexp_extract(trim({col}), '{rx}', 5), '') AS DOUBLE), 1.0) AS sample, "
        f"regexp_matches(regexp_extract(trim({col}), '{rx}', 2), '^[+-]') AS delta "
        f"FROM ({pk_sql})"
    )
    return (
        f"SELECT * FROM ({inner}) WHERE name IS NOT NULL AND value IS NOT NULL "
        f"AND metric IS NOT NULL AND sample >= 0.0 AND sample <= 1.0"
    )
