"""Ports of the reference's DSL tests (dsl/funcs_test.go) run through
OUR parser/evaluator — same expressions, same expected values.

The reference fixtures are RRAs with constant or generated values
(funcs_test.go:40-115); here the catalog is the equivalent
SeriesFrame. NaN in the reference maps to NULL here.
"""

from __future__ import annotations

import math

import pytest

from tgres_spark.dsl.evaluator import DslContext, evaluate

STEP = 60
T0, T1 = 60, 3600  # one hour of minute slots, end-labeled


@pytest.fixture(scope="module")
def td(spark):
    """foo.bar1.baz = 10, foo.bar2.baz = 20 everywhere, plus a ramp
    series (0,1,2,...) — the shapes funcs_test.go builds."""
    rows = []
    for i, t in enumerate(range(T0, T1 + 1, STEP)):
        rows.append(("foo.bar1.baz", t, 10.0))
        rows.append(("foo.bar2.baz", t, 20.0))
        rows.append(("ramp.series", t, float(i)))
        rows.append(("wave.series", t, math.sin(2 * math.pi / 10 * i)))
    catalog = spark.createDataFrame(rows, "name string, t long, value double")
    return DslContext(catalog, t_from=T0, t_to=T1)


def vals(df):
    return [r["value"] for r in df.orderBy("t").collect()]


def every_value_is(df, expect, tol=1e-9):
    vs = vals(df)
    assert vs, "empty result"
    assert all(
        v is not None and math.isclose(v, expect, abs_tol=tol) for v in vs
    ), vs[:5]


# Test_dsl_averageSeries (funcs_test.go:64)
def test_average_series_of_constant_lines(td):
    for fn in ("averageSeries", "avg"):
        out = evaluate(td, f"{fn}(constantLine(10), constantLine(20), constantLine(30))")
        every_value_is(out, 20.0)


# Test_dsl_sumSeries (funcs_test.go:236)
def test_sum_series(td):
    every_value_is(evaluate(td, "sumSeries(foo.*.baz)"), 30.0)
    every_value_is(evaluate(td, "sum(constantLine(1), constantLine(2))"), 3.0)


# Test_dsl_maxSeries / minSeries (funcs_test.go:187,199)
def test_max_min_series(td):
    every_value_is(evaluate(td, "maxSeries(foo.*.baz)"), 20.0)
    every_value_is(evaluate(td, "minSeries(foo.*.baz)"), 10.0)
    every_value_is(evaluate(td, "max(constantLine(3), constantLine(4))"), 4.0)
    every_value_is(evaluate(td, "min(constantLine(3), constantLine(4))"), 3.0)


# Test_dsl_rangeOfSeries (funcs_test.go:224)
def test_range_of_series(td):
    every_value_is(evaluate(td, "rangeOfSeries(foo.*.baz)"), 10.0)


# Test_dsl_percentileOfSeries (funcs_test.go:211)
def test_percentile_of_series(td):
    # go-metrics quantile of [10,20] at p=0.5: pos=1.5 → 10+0.5*10=15
    every_value_is(evaluate(td, "percentileOfSeries(foo.*.baz, 50)"), 15.0)


# Test_dsl_multiplySeries (funcs_test.go:248)
def test_multiply_series(td):
    every_value_is(evaluate(td, "multiplySeries(foo.*.baz)"), 200.0)


# Test_dsl_group (funcs_test.go:163)
def test_group(td):
    out = evaluate(td, "group(foo.bar1.baz, foo.bar2.baz)")
    names = {r["name"] for r in out.select("name").distinct().collect()}
    assert names == {"foo.bar1.baz", "foo.bar2.baz"}


# Test_dsl_isNonNull (funcs_test.go:175)
def test_is_non_null(td):
    every_value_is(evaluate(td, "isNonNull(foo.bar1.baz)"), 1.0)


# Test_dsl_absolute (funcs_test.go:260)
def test_absolute(td):
    every_value_is(evaluate(td, "absolute(offset(constantLine(10), -20))"), 10.0)


# Test_dsl_derivative (funcs_test.go:272): v[i] = gen[i] - gen[i-1]
def test_derivative_of_ramp(td):
    vs = vals(evaluate(td, "derivative(ramp.series)"))
    assert vs[0] is None  # first point has no predecessor
    assert all(math.isclose(v, 1.0) for v in vs[1:])


# Test_dsl_integral (funcs_test.go:295): running sum
def test_integral_of_ramp(td):
    vs = vals(evaluate(td, "integral(ramp.series)"))
    n = len(vs)
    assert vs == [float(i * (i + 1) // 2) for i in range(n)]


# Test_dsl_logarithm (funcs_test.go:318)
def test_logarithm(td):
    for fn in ("log", "logarithm"):
        every_value_is(evaluate(td, f"{fn}(constantLine(10))"), 1.0)


# Test_dsl_nonNegativeDerivative (funcs_test.go:333): negative → NaN/NULL
def test_non_negative_derivative_of_wave(td):
    vs = vals(evaluate(td, "nonNegativeDerivative(wave.series)"))
    gen = [math.sin(2 * math.pi / 10 * i) for i in range(len(vs))]
    for i in range(1, len(vs)):
        d = gen[i] - gen[i - 1]
        if d < 0:
            assert vs[i] is None
        else:
            assert math.isclose(vs[i], d, abs_tol=1e-9)


# Test_dsl_offset / offsetToZero (funcs_test.go:361,373)
def test_offset_and_offset_to_zero(td):
    every_value_is(evaluate(td, "offset(foo.bar1.baz, 5)"), 15.0)
    every_value_is(evaluate(td, "offsetToZero(foo.bar2.baz)"), 0.0)
    # offsetToZero of the ramp subtracts its min (0) — identity
    vs = vals(evaluate(td, "offsetToZero(ramp.series)"))
    assert vs == [float(i) for i in range(len(vs))]


# Test_dsl_scale (funcs_test.go:396)
def test_scale(td):
    every_value_is(evaluate(td, "scale(foo.bar1.baz, 2.5)"), 25.0)


# Test_dsl_timeshift (funcs_test.go:408): data shifts forward
def test_timeshift(td):
    out = evaluate(td, 'timeShift(ramp.series, "1h")')
    ts = sorted(r["t"] for r in out.collect())
    assert ts[0] == T0 + 3600 and ts[-1] == T1 + 3600


# Test_dsl_transformNull (funcs_test.go:428)
def test_transform_null(td, spark):
    rows = [("gappy", 60, 1.0), ("gappy", 120, None), ("gappy", 180, 3.0)]
    ctx = DslContext(
        spark.createDataFrame(rows, "name string, t long, value double")
    )
    vs = vals(evaluate(ctx, "transformNull(gappy, -1)"))
    assert vs == [1.0, -1.0, 3.0]


# Test_dsl_multiseriesStuff (funcs_test.go:83): wildcards + groupByNode
def test_multiseries_wildcards(td):
    every_value_is(evaluate(td, "sumSeriesWithWildcards(foo.*.baz, 1)"), 30.0)
    every_value_is(evaluate(td, "averageSeriesWithWildcards(foo.*.baz, 1)"), 15.0)
    out = evaluate(td, "groupByNode(foo.*.baz, 1, 'sum')")
    names = {r["name"] for r in out.select("name").distinct().collect()}
    assert names == {"bar1", "bar2"}


def test_exclude_and_timestack(td):
    out = evaluate(td, "exclude(foo.*.baz, 'bar2')")
    names = {r["name"] for r in out.select("name").distinct().collect()}
    assert names == {"foo.bar1.baz"}
    stack = evaluate(td, 'timeStack(foo.bar1.baz, "1h", 0, 2)')
    names = {r["name"] for r in stack.select("name").distinct().collect()}
    assert len(names) == 3  # k = 0, 1, 2
