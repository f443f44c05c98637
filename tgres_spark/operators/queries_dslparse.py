"""SURVEY §2.6 — end-to-end Graphite expression parsing queries.

The whole point of tgres's dsl package: a target STRING goes in, a
series set comes out. These queries run real expressions through
parse → glob fetch → function dispatch → DataFrame plan, and the
oracle replays the equivalent SQL composition — so the parser and
evaluator are themselves under the correctness gate.
"""

from __future__ import annotations

from ..dsl.evaluator import DslContext, evaluate
from ..dsl.find import find, find_sql
from ..operators import dsl_calculate as dc
from ..operators import dsl_combine as db
from ..operators import dsl_transform as dt
from ..registry import register
from .queries_dsl import DOTTED_SQL, dotted

CATALOG_SQL = DOTTED_SQL


def _ctx(spark, sf_dir):
    return DslContext(dotted(spark, sf_dir))


@register(
    "dsl_expression_parser",
    sql=dc.moving_average_sql(
        db.sum_series_sql(
            f"SELECT * FROM ({CATALOG_SQL}) WHERE regexp_matches(name, '^app\\.[^.]*\\.rate$')"
        ),
        5,
    ),
)
def dsl_expression_parser(spark, sf_dir):
    return evaluate(_ctx(spark, sf_dir), "movingAverage(sumSeries(app.*.rate), 5)")


@register(
    "dsl_expression_nested",
    sql=dt.absolute_sql(
        dt.offset_sql(
            f"SELECT * FROM ({CATALOG_SQL}) WHERE regexp_matches(name, '^app\\.(click|view)\\.rate$')",
            -50.0,
        )
    ),
)
def dsl_expression_nested(spark, sf_dir):
    return evaluate(_ctx(spark, sf_dir), "absolute(offset(app.{click,view}.rate, -50))")


@register(
    "dsl_expression_filter_chain",
    sql=dc.n_percentile_sql(
        (
            # highestAverage(..., 2) replay
            "SELECT b.* FROM ({base}) b WHERE b.name IN ("
            "SELECT name FROM (SELECT name, ROW_NUMBER() OVER "
            "(ORDER BY stat DESC NULLS LAST, name ASC) AS rn FROM "
            "(SELECT name, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value) AS stat "
            "FROM ({base}) GROUP BY name)) WHERE rn <= 2)"
        ).format(base=CATALOG_SQL),
        95.0,
    ),
)
def dsl_expression_filter_chain(spark, sf_dir):
    return evaluate(
        _ctx(spark, sf_dir), "nPercentile(highestAverage(app.*.rate, 2), 95)"
    )


_T1 = 1704067200 + 30 * 86400  # events epoch end — the 'now' anchor


@register(
    "dsl_expression_timerange",
    sql=db.sum_series_sql(
        f"SELECT * FROM ({CATALOG_SQL}) WHERE "
        "regexp_matches(name, '^app\\.[^.]*\\.rate$') "
        f"AND t >= {_T1 - 7 * 86400} AND t <= {_T1}"
    ),
)
def dsl_expression_timerange(spark, sf_dir):
    """Relative from/until strings through the reference's parseTime
    semantics (http/graphite.go:197-218): '-7d'..'now' anchored at a
    fixed now for determinism."""
    ctx = DslContext(dotted(spark, sf_dir), t_from="-7d", t_to="now", now=_T1)
    return evaluate(ctx, "sumSeries(app.*.rate)")


@register(
    "dsl_expression_weighted",
    sql=db.weighted_average_pair_sql(
        f"SELECT * FROM ({CATALOG_SQL}) WHERE regexp_matches(name, '^app\\.(click|view)\\.rate$')",
        f"SELECT * FROM ({CATALOG_SQL}) WHERE regexp_matches(name, '^app\\.[^.]*\\.rate$')",
        node=1,
    ),
)
def dsl_expression_weighted(spark, sf_dir):
    """Expression-path weightedAverage: separate avg/weight selectors
    paired by name node (dslWeightedAverage, funcs.go:2018-2062) —
    weight-only keys (error/purchase/signup) drop out."""
    return evaluate(
        _ctx(spark, sf_dir),
        "weightedAverage(app.{click,view}.rate, app.*.rate, 1)",
    )


@register(
    "dsl_expression_divide",
    sql=db.divide_series_pair_sql(
        f"SELECT * FROM ({CATALOG_SQL}) WHERE name = 'app.click.rate'",
        f"SELECT * FROM ({CATALOG_SQL}) WHERE name = 'app.view.rate'",
    ),
)
def dsl_expression_divide(spark, sf_dir):
    """Expression-path divideSeries with ZERO driver collects (side
    tags replace name discovery; arity enforced in-plan)."""
    return evaluate(
        _ctx(spark, sf_dir), "divideSeries(app.click.rate, app.view.rate)"
    )


@register(
    "dsl_color",
    sql=(
        f"SELECT * FROM ({CATALOG_SQL}) "
        "WHERE regexp_matches(name, '^app\\.[^.]*\\.rate$')"
    ),
)
def dsl_color(spark, sf_dir):
    """color() is charting metadata: the reference returns the series
    map unchanged (dslColor, funcs.go:941-943) — identity on
    (name, t, value), exercised through the expression parser so the
    string argument path is covered too."""
    return evaluate(_ctx(spark, sf_dir), "color(app.*.rate, 'red')")


@register(
    "find_glob",
    sql=find_sql(f"SELECT DISTINCT name FROM ({CATALOG_SQL})", "app.*"),
)
def find_glob(spark, sf_dir):
    catalog = dotted(spark, sf_dir).select("name").distinct()
    return find(catalog, "app.*")


@register(
    "find_glob_leaf",
    sql=find_sql(f"SELECT DISTINCT name FROM ({CATALOG_SQL})", "app.{click,error}.*"),
)
def find_glob_leaf(spark, sf_dir):
    catalog = dotted(spark, sf_dir).select("name").distinct()
    return find(catalog, "app.{click,error}.*")
