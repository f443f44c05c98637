"""Similarity search over an embedding column (SURVEY §2.8).

- ann_cosine_topk: exact brute-force baseline. Query set × corpus
  with a broadcast of the (small) query side; dot products are
  left-folds over zip_with so Spark and DuckDB sum in the same order
  (bit-identical → SQL-checkable).
- ann_lsh_buckets: random-hyperplane LSH. Planes are seeded numpy —
  deterministic — applied as an Arrow-batched pandas UDF (matrix
  multiply per batch; this is the vectorized fast path, not per-row).
- ann_ivf_search: IVF with k-means centroids. Centroids are fit on a
  bounded sample driver-side (centroids are tiny; the *assignment*
  is distributed), then probing is a broadcast join against the
  nprobe nearest cells.

At 100 TB: brute force is the correctness oracle at small n; LSH and
IVF are the scale paths — both turn all-pairs into bucket-local work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Tt


def _dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def ann_cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 10) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vectors.
    Returns (query_id, neighbor_id, cos, rank); ties broken by id."""
    from pyspark.sql import Window

    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("bigint"))
    )


def ann_cosine_topk_sql(n_queries: int = 10, k: int = 10) -> str:
    dot = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), "
        "i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))), (acc, x) -> acc + x)"
    )
    nrm = (
        "SQRT(list_reduce(list_prepend(0.0, list_transform({v}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x))"
    )
    cos = f"({dot}) / ({nrm.format(v='q.qv')} * {nrm.format(v='c.cv')})"
    return (
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
        f"WHERE vec_id < {n_queries}), "
        "c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings), "
        f"scored AS (SELECT query_id, neighbor_id, {cos} AS cos "
        "FROM q JOIN c ON query_id <> neighbor_id) "
        "SELECT query_id, neighbor_id, cos, rank FROM ("
        "SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank "
        f"FROM scored) WHERE rank <= {k}"
    )


def ann_lsh_buckets(emb: DataFrame, n_planes: int = 12, seed: int = 42) -> DataFrame:
    """(vec_id, bucket): sign pattern against seeded random hyperplanes.
    Vectors sharing a bucket are ANN candidates."""
    dim = 64

    def fn(it):
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        for pdf in it:
            mat = np.stack(pdf["embedding"].to_numpy())
            signs = (mat @ planes) > 0
            bucket = signs.dot(1 << np.arange(n_planes)).astype("int64")
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "bucket": bucket})

    return emb.select("vec_id", "embedding").mapInPandas(
        fn, schema="vec_id long, bucket long"
    )


def ann_ivf_search(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    sample_limit: int = 100_000,
) -> DataFrame:
    """IVF: k-means cells (fit on a bounded sample), probe the nprobe
    nearest cells per query, exact cosine within probed cells.
    Returns (query_id, neighbor_id, cos, rank)."""
    from pyspark.sql import Window

    # Deterministic distributed sample: rank by a seeded hash of the id
    # and take the lowest N (TakeOrderedAndProject — a distributed
    # top-k, not a single-partition sort). Unlike limit() with no
    # ordering, this is unbiased w.r.t. file/partition layout and
    # replays identically on any cluster shape.
    sample_rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.concat_ws(":", F.lit(seed), F.col("vec_id"))))
        .limit(sample_limit)
        .collect()
    )
    sample = np.stack([r["embedding"] for r in sample_rows]).astype("float64")
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(8):  # Lloyd iterations
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(n_cells):
            pts = sample[assign == j]
            if len(pts):
                cents[j] = pts.mean(axis=0)
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(int(j), [float(x) for x in cents[j]]) for j in range(n_cells)],
        "cell int, centroid array<double>",
    )

    dist = F.aggregate(
        F.zip_with(
            "embedding", "centroid", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wmin = Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cell").asc())
    assigned = (
        emb.crossJoin(F.broadcast(cdf))
        .select("vec_id", "embedding", "cell", dist.alias("d"))
        .withColumn("rn", F.row_number().over(wmin))
    )
    corpus = assigned.where(F.col("rn") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "cell",
    )
    probes = (
        assigned.where(F.col("vec_id") < n_queries)
        .where(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cell")
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("bigint"))
    )
