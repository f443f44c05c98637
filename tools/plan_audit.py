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
    "carbon_pickle_stream",
    "ann_ivf_search",  # iterative Lloyd: collects per round by design
}

# declared exceptions: query -> allowed smells
ALLOW = {
    # driver union-find shortcut collects the ≤10M-edge pair list;
    # the distributed loop is the pinned authority above the gate
    "dedup_components": {"SinglePartition"},
    # k-means|| seeding collects candidate rows (KBs) by design
    # UniMax water-filling: the rank/prefix window runs on the
    # per-LANGUAGE aggregate (hundreds of rows at any corpus scale —
    # languages, not documents); the corpus-size work is the groupBy
    "pipeline_mix_unimax": {"SinglePartition"},
}

SMELLS = ("CartesianProduct", "BatchEvalPython")


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
        if "SinglePartition" in plan and "Window" in plan and \
                "SinglePartition" not in allowed:
            # only flag single-partition WINDOWS (global sorts);
            # scalar aggregates legitimately reduce to one partition
            import re

            # a Window node whose partitioning is SinglePartition
            if re.search(r"Arguments: \[[^\]]*\], \[\]", plan) or \
                    "Exchange SinglePartition" in plan and "Window" in plan:
                # distinguish: Exchange SinglePartition feeding Window
                wpos = [m.start() for m in re.finditer("Window", plan)]
                spos = [m.start() for m in re.finditer(
                    "Exchange SinglePartition", plan)]
                if wpos and spos:
                    bad.append((name, "SinglePartition window"))
    for name, smell in bad:
        print(f"SMELL {name}: {smell}")
    print(f"== audited {len(qs) - len(SKIP)} plans, "
          f"{len(bad)} undeclared smells ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
