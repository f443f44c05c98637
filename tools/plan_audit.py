#!/usr/bin/env python3
"""Physical-plan smell audit over EVERY registered query.

Builds each query's DataFrame at sf0.001 and greps the formatted plan
for the anti-patterns the scale posture forbids:

- CartesianProduct            (all-pairs joins)
- BatchEvalPython             (row-at-a-time Python UDFs; Arrow
                               surfaces show up as ArrowEvalPython /
                               FlatMapGroupsInPandas / MapInPandas
                               and are allowed where declared)
- SinglePartition window      (a global-sort window: every row
                               through one task)

Known-and-declared exceptions are listed per query. Exit code 1 when
an undeclared smell appears, so this can run in CI next to
check_oracle. Streaming/stateful queries execute a real run when
built; they are plan-audited via their batch-equivalent surfaces in
tests instead, and skipped here.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

# queries whose build triggers a real (streaming/iterative) run —
# covered by tests/test_streaming.py and test_pipeline_semantics.py
SKIP = {
    "streaming_ingest_pipeline",
    "streaming_paced_metric",
    "streaming_name_catalog",
    "streaming_catalog_compact",
    "streaming_dedup_incremental",
    "streaming_attribution",
    "streaming_rfm",
    "streaming_scene_cuts",
    "carbon_pickle_stream",
    "ann_ivf_search",  # iterative Lloyd: collects per round by design
}

# declared exceptions: query -> allowed smells. Every SinglePartition
# entry is a window over a relation whose size is BOUNDED by
# construction (cluster width, sketch bins, one render series) —
# never by row count of the input tables.
ALLOW = {
    # driver union-find shortcut collects the ≤10M-edge pair list;
    # the distributed loop is the pinned authority above the gate
    "dedup_components": {"SinglePartition"},
    # k-means|| seeding collects candidate rows (KBs) by design
    # UniMax water-filling: the rank/prefix window runs on the
    # per-LANGUAGE aggregate (hundreds of rows at any corpus scale —
    # languages, not documents); the corpus-size work is the groupBy
    "pipeline_mix_unimax": {"SinglePartition"},
    # _distributed_rank's only global window runs over the
    # per-partition COUNTS (≤ shuffle-partitions rows — cluster
    # width, not series count); the per-series ranking itself is
    # range-partitioned. Surfaced by the round-6 parsed detector
    # (the round-5 substring heuristic false-negatived these).
    "dsl_sortByName": {"SinglePartition"},
    "dsl_sortByMaxima": {"SinglePartition"},
    "dsl_sortByMinima": {"SinglePartition"},
    "dsl_sortByTotal": {"SinglePartition"},
    # quantile read-off windows run on the BIN relation (g, b, c) —
    # bounded by value-range/width, not by event count — and the
    # single literal funnel group constant-folds the partition key
    # away entirely
    "events_conversion_lag": {"SinglePartition"},
    # movingAverage AFTER sumSeries: a combine emits ONE series with
    # a literal name, so the per-series window constant-folds to
    # global — bounded by the render's slot count (maxDataPoints),
    # exactly like the reference evaluating one target expression
    "dsl_expression_parser": {"SinglePartition"},
    # a generated single series' cumulative walk: one series by
    # definition, bounded by the requested time range
    "dsl_randomWalk": {"SinglePartition"},
    # the Zipf rank window runs on the top-k relation AFTER
    # TakeOrderedAndProject — bounded by the k=100 literal, never by
    # corpus size (the events_conversion_lag class)
    "corpus_zipf_fit": {"SinglePartition"},
    # the period-over-period lag runs on the PERIOD relation — rows =
    # corpus timespan / 30 days (hundreds for decades of data), never
    # row-count-sized (the corpus_zipf_fit class)
    "tpch_orders_seasonality": {"SinglePartition"},
}

SMELLS = ("CartesianProduct", "BatchEvalPython")


def _arg_groups(body: str) -> list[str]:
    """Split a formatted-plan Arguments payload into its top-level
    '[...]' groups (bracket-depth scan; window exprs nest brackets)."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                groups.append(body[start : i + 1])
                start = None
    return groups


def global_window_specs(plan: str) -> int:
    """Count Window nodes whose OWN partition spec is empty (a global
    sort: every row through one task).

    Parses the formatted plan's detail section — each '(N) Window'
    node prints 'Arguments: [window exprs](, [partition spec])?,
    [order spec]' with the partition group OMITTED when empty — and
    checks the node's own spec, instead of the round-5 heuristic of
    'Window' and 'Exchange SinglePartition' co-occurring anywhere in
    the plan text (which false-positives on a scalar aggregate's
    Exchange next to an unrelated partitioned Window, and
    false-negatives when the substrings land in an unexpected order).
    With two groups the node is global iff the trailing group is an
    ORDER spec ('col ASC NULLS FIRST'); an unordered-but-partitioned
    window also prints two groups but its trailing group is a bare
    column list."""
    import re

    n = 0
    order_spec = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)\b")
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not re.match(r"\(\d+\) Window(InPandas)?\b", ln.strip()):
            continue
        for j in range(i + 1, min(i + 8, len(lines))):
            arg = lines[j].strip()
            if arg.startswith("Arguments: "):
                groups = _arg_groups(arg[len("Arguments: ") :])
                if len(groups) >= 3:
                    if groups[-2] == "[]":
                        n += 1
                elif len(groups) == 2 and order_spec.search(groups[-1]):
                    n += 1
                break
    return n


def main() -> int:
    from tgres_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("plan_audit")
    qs = e.queries()
    bad = []
    for name, fn in qs.items():
        if name in SKIP:
            continue
        try:
            df = fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"build error: {ex}"))
            continue
        allowed = ALLOW.get(name, set())
        for smell in SMELLS:
            if smell in plan and smell not in allowed:
                bad.append((name, smell))
        # only flag single-partition WINDOWS (global sorts) — the
        # Window node's own partition spec, parsed, not substring
        # co-occurrence; scalar aggregates legitimately reduce to
        # one partition
        if "SinglePartition" not in allowed and global_window_specs(plan):
            bad.append((name, "SinglePartition window"))
    for name, smell in bad:
        print(f"SMELL {name}: {smell}")
    print(f"== audited {len(qs) - len(SKIP)} plans, "
          f"{len(bad)} undeclared smells ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
