"""Parser + evaluator semantics (reference dsl/dsl.go + funcs_test.go)."""

from __future__ import annotations

import pytest

from tgres_spark.dsl.evaluator import DslContext, evaluate
from tgres_spark.dsl.parser import Call, Literal, Pattern, glob_to_regex, parse


def test_parse_pattern():
    n = parse("web.host1.cpu")
    assert isinstance(n, Pattern) and n.text == "web.host1.cpu"


def test_parse_call_with_args():
    n = parse("movingAverage(sumSeries(web.*.hits), 5)")
    assert isinstance(n, Call) and n.func == "movingAverage"
    inner = n.args[0]
    assert isinstance(inner, Call) and inner.func == "sumSeries"
    assert isinstance(inner.args[0], Pattern)
    assert n.args[1] == Literal(5.0)


def test_parse_strings_and_negatives():
    n = parse('alias(offset(a.b, -10), "renamed")')
    assert n.func == "alias" and n.args[1] == Literal("renamed")
    assert n.args[0].args[1] == Literal(-10.0)


def test_parse_rejects_garbage():
    for bad in ["f(", "f(a,,b)", "a b", ")", "f(a))"]:
        with pytest.raises(SyntaxError):
            parse(bad)


def test_glob_star_stays_in_segment():
    rx = glob_to_regex("web.*.hits")
    import re

    assert re.match(rx, "web.h1.hits")
    assert not re.match(rx, "web.h1.extra.hits")


def test_glob_braces_and_classes():
    import re

    rx = glob_to_regex("app.{click,view}.rate")
    assert re.match(rx, "app.click.rate") and re.match(rx, "app.view.rate")
    assert not re.match(rx, "app.error.rate")
    rx2 = glob_to_regex("host[0-2].cpu")
    assert re.match(rx2, "host1.cpu") and not re.match(rx2, "host5.cpu")


@pytest.fixture()
def catalog(spark):
    rows = []
    for name in ["web.h1.hits", "web.h2.hits", "db.h1.q"]:
        for t in range(0, 600, 60):
            rows.append((name, t, float(t // 60)))
    return spark.createDataFrame(rows, "name string, t long, value double")


def test_evaluate_pattern_fetch(catalog):
    out = evaluate(DslContext(catalog), "web.*.hits")
    names = {r["name"] for r in out.select("name").distinct().collect()}
    assert names == {"web.h1.hits", "web.h2.hits"}


def test_evaluate_sum_and_scale(catalog):
    out = evaluate(DslContext(catalog), "scale(sumSeries(web.*.hits), 2)")
    rows = {r["t"]: r["value"] for r in out.collect()}
    # both series have value t/60 → sum = 2*(t/60), scaled ×2
    assert rows[120] == 2 * (2 + 2)


def test_evaluate_time_range(catalog):
    ctx = DslContext(catalog, t_from=120, t_to=300)
    out = evaluate(ctx, "web.h1.hits")
    ts = sorted(r["t"] for r in out.collect())
    assert ts == [120, 180, 240, 300]


def test_evaluate_unknown_function(catalog):
    with pytest.raises(ValueError, match="unknown DSL function"):
        evaluate(DslContext(catalog), "definitelyNotAFunction(web.h1.hits)")


def test_evaluate_chained_filters(catalog):
    out = evaluate(
        DslContext(catalog), "highestAverage(group(web.*.hits, db.*.q), 1)"
    )
    names = {r["name"] for r in out.select("name").distinct().collect()}
    assert len(names) == 1
