"""Graphite time-spec parsing: relative/absolute from/until strings.

Reference: http/graphite.go:197-218 parseTime — `-<dur>` (relative to
now), `now`, or an epoch-seconds integer — with durations parsed per
misc/misc.go:39-77 BetterParseDuration: Go duration syntax
(`1h30m`, `90s`, `1.5h`, ms/us/ns) extended with graphite-ish units —
`min`/`minute(s)` → m, `hour(s)` → h, `week(s)` → w, `mon` (30 days),
and bare `d`/`w`/`y` suffixes (24h / 168h / 8760h per unit).

Everything is pure driver-side string math on request parameters —
zero Spark jobs. `now` is an explicit argument so render paths and
oracle queries stay deterministic (the wall clock is only consulted
when the caller passes now=None).
"""

from __future__ import annotations

import re
import time as _time

_GO_UNITS = {
    "ns": 1e-9,
    "us": 1e-6,
    "µs": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
}
_EXT_UNITS = {"d": 86400.0, "w": 604800.0, "y": 31536000.0}

_TOKEN = re.compile(r"(\d+(?:\.\d*)?|\.\d+)(ns|us|µs|ms|s|m|h|d|w|y)")


def parse_duration(s: str) -> float:
    """Duration string → seconds (BetterParseDuration semantics).
    Raises ValueError on anything unparseable."""
    orig = s
    s = s.strip()
    # graphite-ish suffix rewrites (misc.go:41-61), longest first
    if s.endswith("minutes"):
        s = s[:-6]
    elif s.endswith("minute"):
        s = s[:-5]
    elif s.endswith("min"):
        s = s[:-2]
    elif s.endswith("hours"):
        s = s[:-4]
    elif s.endswith("hour"):
        s = s[:-3]
    elif s.endswith("mon"):
        return float(s[:-3]) * 30 * 86400
    elif s.endswith("weeks"):
        s = s[:-4]
    elif s.endswith("week"):
        s = s[:-3]
    if not s:
        raise ValueError(f"invalid duration: {orig!r}")
    total, pos = 0.0, 0
    for m in _TOKEN.finditer(s):
        if m.start() != pos:
            break
        val, unit = float(m.group(1)), m.group(2)
        total += val * _GO_UNITS.get(unit, _EXT_UNITS.get(unit, 0.0))
        pos = m.end()
    if pos != len(s) or pos == 0:
        raise ValueError(f"invalid duration: {orig!r}")
    return total


def parse_time(spec, now: int | None = None) -> int | None:
    """from/until spec → epoch seconds (parseTime semantics).

    Accepts: None/'' → None; int (passed through); 'now'; '-<dur>'
    relative to ``now``; decimal epoch-seconds string."""
    if spec is None:
        return None
    if isinstance(spec, (int, float)):
        return int(spec)
    s = str(spec).strip()
    if not s:
        return None
    anchor = int(_time.time()) if now is None else int(now)
    if s.startswith("-"):
        return anchor - int(parse_duration(s[1:]))
    if s == "now":
        return anchor
    try:
        return int(s)
    except ValueError:
        raise ValueError(f"cannot parse time {spec!r}") from None
