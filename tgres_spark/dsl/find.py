"""/metrics/find: hierarchical glob browse over the name catalog.

Reference: dsl/fs_find_cache.go — tgres keeps an in-memory prefix
tree of DS names. Spark-first, the catalog is a DataFrame of distinct
names and find() is a projection: match the glob at its depth, cut
each name to that depth, and mark leaves (exact-depth names) vs
branches (names that continue deeper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NAME
from .parser import glob_to_regex


def find(catalog: DataFrame, pattern: str) -> DataFrame:
    """(path, is_leaf bigint): unique nodes at the pattern's depth.

    A name is a leaf node when it ends at the pattern depth, a branch
    when it continues; a path can be both (leaf + branch) like
    Graphite's find — we report is_leaf = max over matches.
    """
    depth = pattern.count(".") + 1
    parts = F.split(F.col(NAME), r"\.")
    prefix = F.concat_ws(".", F.slice(parts, 1, depth))
    m = catalog.where(
        (F.size(parts) >= depth)
        & prefix.rlike(glob_to_regex(pattern))
    )
    return (
        m.select(
            prefix.alias("path"),
            F.when(F.size(parts) == depth, 1).otherwise(0).alias("leaf"),
        )
        .groupBy("path")
        .agg(F.max("leaf").cast("bigint").alias("is_leaf"))
    )


def find_sql(catalog_sql: str, pattern: str) -> str:
    depth = pattern.count(".") + 1
    # standard SQL strings treat backslash literally — only quotes escape
    rx = glob_to_regex(pattern).replace("'", "''")
    parts = "string_split(name, '.')"
    prefix = f"array_to_string(list_slice({parts}, 1, {depth}), '.')"
    return (
        f"SELECT {prefix} AS path, "
        f"CAST(MAX(CASE WHEN len({parts}) = {depth} THEN 1 ELSE 0 END) AS BIGINT) AS is_leaf "
        f"FROM ({catalog_sql}) WHERE len({parts}) >= {depth} "
        f"AND regexp_matches({prefix}, '{rx}') "
        f"GROUP BY {prefix}"
    )
