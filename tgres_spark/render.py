"""Render API: the tgres HTTP surface as library functions.

Reference: http/graphite.go — `/render?target=...&from=...&until=...&
maxDataPoints=...` evaluates each target and returns
`[{"target": name, "datapoints": [[value, ts], ...]}, ...]`;
`/metrics/find?query=...` returns the name tree nodes.

No HTTP server here (the engine is a library over a cluster); these
functions produce exactly the same payloads, so any thin HTTP wrapper
(Flask/our own) is presentation only. graphite-web's JSON shape is the
contract charting UIs expect.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dsl.evaluator import DslContext, evaluate
from .dsl.find import find
from .model import NAME, T, VALUE


def render_df(
    catalog: DataFrame,
    targets: list[str],
    t_from: int | str | None = None,
    t_to: int | str | None = None,
    max_points: int | None = None,
    now: int | None = None,
) -> DataFrame:
    """Evaluate targets → one long frame (target, name, t, value).
    `target` carries the originating expression string so multi-target
    requests stay distinguishable. from/until accept graphite time
    strings ('-1h', 'now', epoch) like the reference's render handler
    (http/graphite.go parseTime); relative forms anchor to ``now``."""
    from functools import reduce

    ctx = DslContext(
        catalog, t_from=t_from, t_to=t_to, max_points=max_points, now=now
    )
    parts = []
    for tgt in targets:
        df = evaluate(ctx, tgt)
        parts.append(df.select(F.lit(tgt).alias("target"), NAME, T, VALUE))
    return reduce(DataFrame.unionAll, parts)


def render_json(
    catalog: DataFrame,
    targets: list[str],
    t_from: int | str | None = None,
    t_to: int | str | None = None,
    max_points: int | None = None,
    now: int | None = None,
) -> str:
    """graphite-web JSON: [{"target": series_name, "datapoints":
    [[value, ts], ...]}]. Datapoint assembly happens JVM-side
    (collect_list of sorted structs); the driver only json-serializes
    the already-shaped rows."""
    df = render_df(catalog, targets, t_from, t_to, max_points, now=now)
    shaped = (
        df.groupBy("target", NAME)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(T).alias("t"), F.col(VALUE).alias("v")))
            ).alias("pts")
        )
        .orderBy("target", NAME)
    )
    out = []
    for r in shaped.collect():
        out.append(
            {
                "target": r[NAME],
                "datapoints": [[p["v"], p["t"]] for p in r["pts"]],
            }
        )
    return json.dumps(out)


def find_json(catalog: DataFrame, query: str) -> str:
    """`/metrics/find` JSON: [{"text": leaf_name, "id": path,
    "leaf": 0/1, "expandable": 0/1}] (graphite-web "treejson")."""
    rows = find(catalog.select(NAME).distinct(), query).orderBy("path").collect()
    out = [
        {
            "text": r["path"].rsplit(".", 1)[-1],
            "id": r["path"],
            "leaf": int(r["is_leaf"]),
            "expandable": 1 - int(r["is_leaf"]),
        }
        for r in rows
    ]
    return json.dumps(out)


def pixel_datapoints(spark: SparkSession, hits: DataFrame) -> DataFrame:
    """http/pixel.go parity: each pixel hit is a count-1 datapoint for
    the metric named in the URL path. hits = (metric string, t bigint)."""
    from .model import sanitize_name

    return hits.select(
        sanitize_name(F.col("metric")).alias(NAME),
        F.col(T),
        F.lit(1.0).alias(VALUE),
    )
