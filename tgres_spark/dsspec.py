"""Config-driven DS specs: which archives a series gets.

Reference: etc/tgres.conf.sample + daemon/config.go — `[[ds]]` blocks
with a name regexp, base step, heartbeat, and RRA strings
`"[wmean|min|max|last:]step:span[:xff]"`; the FIRST matching block
configures a new series.

Spark-first: `apply_specs` compiles the whole config into one plan —
each series routes to its first matching spec (regexp + NOT any
earlier regexp, all pushed-down predicates) and fans into that spec's
consolidations. The output is the materialized archive set, named
`<cf>:<step>/<series>` like rrd_multi_rra. Run it as the nightly
compaction/backfill job or on the streaming path per micro-batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import NAME
from .operators.consolidate import consolidate, oracle_consolidate_sql

_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800, "y": 31536000}


def parse_duration(s: str | int) -> int:
    if isinstance(s, (int, float)):
        return int(s)
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([smhdwy]?)", s.strip())
    if not m:
        raise ValueError(f"bad duration: {s!r}")
    return int(float(m.group(1)) * _UNITS.get(m.group(2) or "s", 1))


@dataclass
class RRASpec:
    cf: str
    step: int
    span: int
    xff: float = 0.0

    @classmethod
    def parse(cls, spec: str) -> RRASpec:
        """`"[cf:]step:span[:xff]"` (daemon/config.go rra parsing)."""
        parts = spec.split(":")
        cf = "wmean"
        if parts and parts[0].lower() in ("wmean", "min", "max", "last"):
            cf = parts.pop(0).lower()
        if len(parts) < 2:
            raise ValueError(f"bad rra spec: {spec!r}")
        step = parse_duration(parts[0])
        span = parse_duration(parts[1])
        xff = float(parts[2]) if len(parts) > 2 else 0.0
        return cls(cf, step, span, xff)


@dataclass
class DSSpec:
    regexp: str
    step: int
    heartbeat: int | None = None
    rras: list[RRASpec] = field(default_factory=list)


def load_config(toml_text: str) -> list[DSSpec]:
    """Parse the `[[ds]]` blocks of a tgres-style TOML config."""
    import tomllib

    cfg = tomllib.loads(toml_text)
    specs = []
    for ds in cfg.get("ds", []):
        specs.append(
            DSSpec(
                regexp=ds["regexp"],
                step=parse_duration(ds.get("step", "10s")),
                heartbeat=(
                    parse_duration(ds["heartbeat"]) if "heartbeat" in ds else None
                ),
                rras=[RRASpec.parse(r) for r in ds.get("rras", [])],
            )
        )
    return specs


def _route(i: int, specs: list[DSSpec]):
    cond = F.col(NAME).rlike(specs[i].regexp)
    for j in range(i):
        cond = cond & ~F.col(NAME).rlike(specs[j].regexp)
    return cond


def _route_sql(i: int, specs: list[DSSpec]) -> str:
    cond = f"regexp_matches(name, '{specs[i].regexp}')"
    for j in range(i):
        cond += f" AND NOT regexp_matches(name, '{specs[j].regexp}')"
    return cond


def apply_specs(sf: DataFrame, specs: list[DSSpec]) -> DataFrame:
    """SeriesFrame → full archive set per the config (first match wins)."""
    parts = []
    for i, spec in enumerate(specs):
        routed = sf.where(_route(i, specs))
        for rra in spec.rras:
            c = consolidate(
                routed, rra.step, cf=rra.cf, xff=rra.xff, heartbeat=spec.heartbeat
            )
            parts.append(
                c.select(
                    F.concat(
                        F.lit(f"{rra.cf}:{rra.step}/"), F.col(NAME)
                    ).alias(NAME),
                    "t",
                    "value",
                )
            )
    if not parts:
        raise ValueError("no rras configured")
    return reduce(DataFrame.unionAll, parts)


def apply_specs_sql(base_sql: str, specs: list[DSSpec]) -> str:
    pieces = []
    for i, spec in enumerate(specs):
        routed = f"SELECT * FROM ({base_sql}) WHERE {_route_sql(i, specs)}"
        for rra in spec.rras:
            inner = oracle_consolidate_sql(
                routed, rra.step, rra.cf, xff=rra.xff, heartbeat=spec.heartbeat
            )
            pieces.append(
                f"SELECT '{rra.cf}:{rra.step}/' || name AS name, t, value "
                f"FROM ({inner})"
            )
    return " UNION ALL ".join(pieces)
