"""Config-driven DS specs (etc/tgres.conf.sample + daemon/config.go)."""

from __future__ import annotations

import pytest

from tgres_spark.dsspec import DSSpec, RRASpec, apply_specs, load_config, parse_duration


def test_parse_duration():
    assert parse_duration("10s") == 10
    assert parse_duration("1m") == 60
    assert parse_duration("2h") == 7200
    assert parse_duration("93d") == 93 * 86400
    assert parse_duration("5y") == 5 * 31536000
    with pytest.raises(ValueError):
        parse_duration("10 parsecs")


def test_parse_rra_spec():
    r = RRASpec.parse("10s:6h")
    assert (r.cf, r.step, r.span, r.xff) == ("wmean", 10, 21600, 0.0)
    r = RRASpec.parse("max:1m:24h:0.5")
    assert (r.cf, r.step, r.span, r.xff) == ("max", 60, 86400, 0.5)
    r = RRASpec.parse("1d:5y:1")
    assert (r.cf, r.step, r.xff) == ("wmean", 86400, 1.0)


def test_load_config_first_match_wins(spark):
    specs = load_config(
        """
[[ds]]
regexp = "^hot"
step = "10s"
rras = ["max:60:3600"]

[[ds]]
regexp = ".*"
step = "10s"
rras = ["60:3600"]
"""
    )
    assert len(specs) == 2 and specs[0].rras[0].cf == "max"
    rows = [
        ("hot.cpu", 10, 5.0), ("hot.cpu", 50, 9.0),
        ("cold.cpu", 10, 5.0), ("cold.cpu", 50, 9.0),
    ]
    sf = spark.createDataFrame(rows, "name string, t long, value double")
    out = {(r["name"], r["t"]): r["value"] for r in apply_specs(sf, specs).collect()}
    # hot routes to the max archive, cold to wmean — and NOT both
    assert out[("max:60/hot.cpu", 60)] == 9.0
    assert ("wmean:60/hot.cpu", 60) not in out
    assert ("max:60/cold.cpu", 60) not in out
    assert abs(out[("wmean:60/cold.cpu", 60)] - (5.0 * 1 + 9.0 * 40) / 41) < 1e-9


def test_apply_specs_requires_rras(spark):
    sf = spark.createDataFrame([("a", 1, 1.0)], "name string, t long, value double")
    with pytest.raises(ValueError, match="no rras"):
        apply_specs(sf, [DSSpec(regexp=".*", step=10)])
