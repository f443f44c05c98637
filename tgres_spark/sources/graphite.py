"""Graphite line-protocol source: ``<name> <value> <timestamp>``.

Reference: tgres daemon text handler (daemon/services.go) feeding
receiver.QueueDataPoint. Works on any DataFrame with a string column
of protocol lines — a socket stream, a text file, or (in tests) lines
synthesized from the events table.

Parsing is pure column expressions (split + casts): stays inside
whole-stage codegen, no Python in the hot path. Malformed lines
become NULLs and are dropped, mirroring the daemon's per-line error
handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NAME, T, VALUE, sanitize_name, sanitize_name_sql


def parse_graphite_lines(lines: DataFrame, col: str = "line") -> DataFrame:
    """lines(col) → SeriesFrame (name, t, value); bad lines dropped.

    Timestamps parse as double then FLOOR to epoch seconds — the
    reference's Sscanf("%d") prefix-scan accepts "1200.0"-style floats
    by truncation (graphite_text.go:223), and a bigint-only try_cast
    silently dropped them while DuckDB's TRY_CAST(BIGINT) kept (and
    rounded!) them — a three-way divergence the adversarial parse
    test pins down. floor == %d-truncation for the non-negative
    timestamps the protocol carries."""
    parts = F.split(F.trim(F.col(col)), r"\s+")
    # try_cast: malformed fields become NULL instead of an ANSI error
    df = lines.select(
        sanitize_name(F.element_at(parts, 1)).alias(NAME),
        F.floor(F.element_at(parts, 3).try_cast("double"))
        .cast("bigint")
        .alias(T),
        F.element_at(parts, 2).try_cast("double").alias(VALUE),
        F.size(parts).alias("_n"),
    )
    return df.where(
        (F.col("_n") == 3)
        & F.col(NAME).isNotNull()
        & F.col(T).isNotNull()
        & F.col(VALUE).isNotNull()
    ).drop("_n")


def parse_graphite_lines_sql(lines_sql: str, col: str = "line") -> str:
    """DuckDB equivalent over ``lines_sql`` producing column ``col``."""
    parts = f"regexp_split_to_array(trim({col}), '\\s+')"
    inner = (
        f"SELECT {sanitize_name_sql(f'{parts}[1]')} AS name, "
        f"CAST(FLOOR(TRY_CAST({parts}[3] AS DOUBLE)) AS BIGINT) AS t, "
        f"TRY_CAST({parts}[2] AS DOUBLE) AS value, "
        f"len({parts}) AS _n "
        f"FROM ({lines_sql})"
    )
    return (
        f"SELECT name, t, value FROM ({inner}) "
        f"WHERE _n = 3 AND name IS NOT NULL AND t IS NOT NULL AND value IS NOT NULL"
    )
