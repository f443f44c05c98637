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

_RX = r"^([^:]+):([+-]?[0-9.]+)\|(c|g|ms)(\|@([0-9.]+))?$"


def parse_statsd_packets(pk: DataFrame, col: str = "packet") -> DataFrame:
    """packets(col) → (name, value, metric, sample, delta).

    Output mirrors statsd.Stat; timestamps ride alongside if the input
    has a ``t`` column (the reference stamps at receive time).
    """
    c = F.trim(F.col(col))
    name = F.regexp_extract(c, _RX, 1)
    value = F.regexp_extract(c, _RX, 2)
    metric = F.regexp_extract(c, _RX, 3)
    sample = F.regexp_extract(c, _RX, 5)
    delta = F.regexp_extract(c, _RX, 2).rlike(r"^[+-]")
    keep = [f for f in pk.columns if f != col]
    out = pk.select(
        *keep,
        F.when(name != "", name).alias("name"),
        F.when(value != "", value).try_cast("double").alias("value"),
        F.when(metric != "", metric).alias("metric"),
        F.coalesce(
            F.when(sample != "", sample).try_cast("double"), F.lit(1.0)
        ).alias("sample"),
        delta.alias("delta"),
    )
    return out.where(
        F.col("name").isNotNull()
        & F.col("value").isNotNull()
        & F.col("metric").isNotNull()
        & (F.col("sample") >= 0.0)
        & (F.col("sample") <= 1.0)
    )


def parse_statsd_packets_sql(pk_sql: str, col: str = "packet", extra: str = "t") -> str:
    rx = r"^([^:]+):([+-]?[0-9.]+)\|(c|g|ms)(\|@([0-9.]+))?$"
    inner = (
        f"SELECT {extra}, "
        f"NULLIF(regexp_extract(trim({col}), '{rx}', 1), '') AS name, "
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
