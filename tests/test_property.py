"""Property tests (hypothesis) for the pure-Python surfaces."""

from __future__ import annotations

import math
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tgres_spark.dsl.parser import Call, Literal, Pattern, glob_to_regex, parse
from tgres_spark.operators.holtwinters import hw_initial_seasonal, hw_smooth
from tgres_spark.sources.whisper import parse_whisper_bytes, write_whisper_bytes

ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
segment = st.from_regex(r"[a-z0-9_]{1,6}", fullmatch=True)
dotted = st.lists(segment, min_size=1, max_size=4).map(".".join)


@given(dotted)
def test_patterns_parse_to_themselves(name):
    node = parse(name)
    # bare words parse as Pattern; fully-numeric words and booleans
    # resolve as literals (numbers win the graphite ambiguity)
    if name in ("true", "false") or re.fullmatch(
        r"-?\d+(\.\d+)?([eE][+-]?\d+)?", name
    ):
        assert isinstance(node, Literal)
    else:
        assert isinstance(node, Pattern) and node.text == name


@given(ident, dotted, st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_calls_parse_structurally(fn, pat, num):
    node = parse(f"{fn}({pat}, {num!r})")
    assert isinstance(node, Call) and node.func == fn
    assert len(node.args) == 2
    assert isinstance(node.args[1], Literal)
    assert math.isclose(node.args[1].value, float(repr(num)), rel_tol=1e-6)


@given(st.lists(segment, min_size=1, max_size=4))
def test_glob_matches_exact_name(parts):
    name = ".".join(parts)
    assert re.match(glob_to_regex(name), name)


@given(st.lists(segment, min_size=2, max_size=4), st.integers(0, 3))
def test_glob_star_matches_any_one_segment(parts, which):
    which = which % len(parts)
    pattern = ".".join("*" if i == which else p for i, p in enumerate(parts))
    name = ".".join(parts)
    assert re.match(glob_to_regex(pattern), name)
    # star must NOT swallow an extra segment
    longer = ".".join(parts[:which] + ["x", "y"] + parts[which + 1 :])
    if longer.count(".") != name.count("."):
        assert not re.match(glob_to_regex(pattern), longer)


@given(
    st.lists(
        st.tuples(
            st.integers(1, 2**31 - 1),
            st.floats(-1e9, 1e9, allow_nan=False),
        ),
        min_size=0,
        max_size=20,
    ),
    st.integers(1, 3600),
)
def test_whisper_roundtrip(points, spp):
    blob = write_whisper_bytes([(spp, points)])
    rows = parse_whisper_bytes("m", blob)
    expect = [("m", spp, ts, v) for ts, v in points if ts != 0]
    assert len(rows) == len(expect)
    for got, want in zip(sorted(rows), sorted(expect)):
        assert got[:3] == want[:3]
        assert math.isclose(got[3], want[3], rel_tol=1e-12) or (
            got[3] == want[3]
        )


@given(
    st.integers(2, 6),
    st.integers(3, 10),
    st.floats(0.01, 0.99),
    st.floats(0.01, 0.99),
    st.floats(0.01, 0.99),
)
@settings(max_examples=25, deadline=None)
def test_hw_smooth_shapes_and_sse(n_seasons, slen, a, b, g):
    i = np.arange(n_seasons * slen, dtype=float)
    data = 100.0 + 5.0 * np.sin(2 * np.pi * i / slen) + 0.1 * i
    seasonal = hw_initial_seasonal(data, slen)
    out, dev, sse = hw_smooth(data, slen, 0.1, seasonal, slen, a, b, g)
    assert len(out) == len(data) + slen
    assert len(dev) == len(out)
    assert sse >= 0 and np.isfinite(sse)


@given(st.floats(1.000001, 10.0), st.floats(0.01, 0.99))
def test_hw_smooth_rejects_bad_alpha(bad, ok):
    _, _, sse = hw_smooth(np.ones(20), 5, 0.0, np.ones(5), 0, bad, ok, ok)
    assert sse > 1e18


# --- micro6 cross-engine determinism core ---------------------------------

micro_vals = st.floats(
    min_value=-9e5, max_value=9e5, allow_nan=False, allow_infinity=False
)


@given(st.lists(micro_vals, min_size=1, max_size=40))
@settings(max_examples=30, deadline=None)
def test_micro6_sum_matches_duckdb_bit_for_bit(vals):
    """The determinism core: floor(x*1e6+0.5) summed as int64 must be
    BIT-identical between Python ints (ground truth for both engines'
    integer arithmetic) and DuckDB's HUGEINT path, including dyadic
    half-way ties and sign changes. Spark's side is pinned by the 146
    oracle-verified queries; this focuses the adversarial value space
    (ties, tiny magnitudes, cancellation) without a JVM in the loop."""
    import math

    import duckdb

    py = sum(math.floor(v * 1000000.0 + 0.5) for v in vals)
    py_final = py / 1000000.0 / len(vals)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck = con.execute(
        "SELECT CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
        "/ 1000000.0 / COUNT(v) FROM t"
    ).fetchone()[0]
    con.close()
    assert duck == py_final, (vals, duck, py_final)


@given(st.lists(micro_vals, min_size=1, max_size=30), st.integers(2, 5))
@settings(max_examples=20, deadline=None)
def test_micro6_sum_is_partition_invariant(vals, n_parts):
    """Int64 micro-unit sums are associative: any partitioning of the
    rows merges to the same total (the property that makes map-side
    partial aggregation and the salted two-phase consolidate exact)."""
    import math

    micro = [math.floor(v * 1000000.0 + 0.5) for v in vals]
    whole = sum(micro)
    parts = [sum(micro[i::n_parts]) for i in range(n_parts)]
    assert sum(parts) == whole


# --- round-5 closed-form cores ---------------------------------------------


@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=200))
def test_cusum_prefix_min_identity(terms):
    """series_cusum's restatement: for ANY integer term sequence,
    s_t = max(0, s_{t-1} + q_t) equals P_t - min_{j<=t} P_j (P the
    inclusive prefix sum, min over P_0=0 included). This is the whole
    correctness of the no-iteration CUSUM; the Spark/DuckDB sides are
    pinned by the oracle, this pins the algebra itself."""
    s, seq = 0, []
    for q in terms:
        s = max(0, s + q)
        seq.append(s)
    p, mn, closed = 0, 0, []
    for q in terms:
        p += q
        mn = min(mn, p)
        closed.append(p - mn)
    assert closed == seq


@given(
    st.lists(st.integers(1, 10**6), min_size=1, max_size=30),
    st.integers(1, 3 * 10**7),
    st.integers(1, 4),
)
def test_unimax_closed_form_equals_greedy_loop(caps, budget, epochs):
    """mix_unimax's water-filling: the monotone prefix test + one θ
    division must allocate exactly like the textbook greedy loop
    (ascending capacity, each language min(cap·E, equal share of the
    remainder)) for ANY capacities/budget/epochs."""
    u = sorted(c * epochs for c in caps)
    n = len(u)
    # greedy reference
    remaining, greedy = float(budget), []
    for i, ui in enumerate(u):
        share = remaining / (n - i)
        take = min(float(ui), share)
        greedy.append(take)
        remaining -= take
    # closed form (the implementation's arithmetic)
    cum, k, cum_k = 0, 0, 0
    for i, ui in enumerate(u, start=1):
        if cum + ui * (n - i + 1) <= budget:
            k, cum_k = i, cum + ui
        cum += ui
    closed = []
    for i, ui in enumerate(u, start=1):
        if i <= k:
            closed.append(float(ui))
        else:
            closed.append((budget - cum_k) / (n - k))
    assert all(abs(a - b) < 1e-6 * max(1.0, abs(b)) for a, b in zip(closed, greedy)), (
        u, budget, closed, greedy,
    )


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    ),
)
@settings(max_examples=25, deadline=None)
def test_asof_semantics_match_duckdb_native(quotes, probes):
    """asof_backward's contract — latest right row with
    t_r <= t_l per key, NULL when none — re-derived by a pure-Python
    scan and compared against DuckDB's native ASOF LEFT JOIN on the
    same rows (the oracle engine), across random keys, ties, and
    empty-match cases. Pins the inclusive-tie rule the Spark side's
    (t, side-tag) sort ordering implements."""
    import duckdb

    q = {}
    for k, t, v in quotes:  # dedup per (key, t): keep max v (arg_max)
        q[(k, t)] = max(q.get((k, t), v), v)
    want = []
    for k, t in probes:
        cand = [(qt, v) for (qk, qt), v in q.items() if qk == k and qt <= t]
        best = max(cand) if cand else None
        want.append((k, t, best[0] if best else None, best[1] if best else None))
    con = duckdb.connect()
    con.execute("CREATE TABLE p (k INT, t INT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", [(k, t) for k, t in probes])
    con.execute("CREATE TABLE c (k INT, t INT, v BIGINT)")
    con.executemany(
        "INSERT INTO c VALUES (?, ?, ?)", [(k, t, v) for (k, t), v in q.items()]
    )
    got = con.execute(
        "SELECT p.k, p.t, c.t, c.v FROM p ASOF LEFT JOIN c "
        "ON p.k = c.k AND p.t >= c.t ORDER BY ALL"
    ).fetchall()
    con.close()
    assert sorted(got, key=lambda r: (r[0], r[1], r[2] is None, r[2] or 0, r[3] or 0)) == sorted(
        want, key=lambda r: (r[0], r[1], r[2] is None, r[2] or 0, r[3] or 0)
    )
