"""SURVEY §2.1 extension — config-driven DS spec rollup query."""

from __future__ import annotations

from ..dsspec import apply_specs, apply_specs_sql, load_config
from ..model import EVENTS_SERIES_SQL, series_from_events
from ..registry import register

# tgres.conf.sample-shaped config: errors get MAX archives with a tight
# heartbeat, everything else the default WMEAN ladder
CONF = """
[[ds]]
regexp = "^err"
step = "10s"
heartbeat = "5m"
rras = ["max:10m:2d", "max:1h:30d"]

[[ds]]
regexp = ".*"
step = "10s"
rras = ["10m:6h", "1h:30d:0.5"]
"""

SPECS = load_config(CONF)


@register("rrd_spec_rollup", sql=apply_specs_sql(EVENTS_SERIES_SQL, SPECS))
def rrd_spec_rollup(spark, sf_dir):
    return apply_specs(series_from_events(spark, sf_dir), SPECS)
