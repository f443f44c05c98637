#!/usr/bin/env python3
"""10x scale rehearsal (round-8 VERDICT #6): the 100 TB posture is
argued on plan shapes; this script checks it MEASURES right one decade
up from the bench SF. It materializes a deterministic ~10x replica of
the sf0.1 tables, runs the most expensive bench queries at sf0.1 and
at 10x with the bench protocol (warmup + best-of-3), and diffs the
EXECUTED physical plans (AQE's final plan, not the initial one — AQE
can flip join strategies only at the larger size, which is exactly
what a single-SF run can't see).

Replication is NOT naive row copying: replica i shifts every id
domain, rewrites a replica-unique token into each document text, and
perturbs one embedding coordinate — otherwise every doc/vector gains
9 exact clones and the dedup/components queries measure clone-join
blowup instead of 10x data. Per-replica duplicate structure (what the
operators are FOR) is preserved exactly.

Usage: python tools/rehearse_10x.py [--replicas N] [--keys k1,k2]
Writes a markdown table + plan diffs to stdout; exits 1 on a plan
smell appearing only at 10x (new CartesianProduct / BatchEvalPython /
single-partition global Exchange).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"

# the five most expensive round-7 bench keys (BENCH_r07 ordering)
DEFAULT_KEYS = [
    "pipeline_corpus_clean",
    "ann_ivfadc_search",
    "dedup_components",
    "statsd_flush_timers",
    "ann_pq_search",
]

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_10x(spark, out: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for tbl in TABLES:
        dst = f"{out}/{tbl}.parquet"
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        if tbl not in ("events", "documents", "embeddings"):
            # relational dims/facts: the expensive keys don't read
            # them; keep them 1x so the dir is a drop-in sf_dir
            df.write.mode("overwrite").parquet(dst)
            continue
        n = df.count()
        parts = []
        for i in range(replicas):
            r = df
            if tbl == "events":
                r = (
                    r.withColumn("event_id", F.col("event_id") + F.lit(i * n))
                    .withColumn("user_id", F.col("user_id") + F.lit(i * 100000))
                    # keep ts/value/event_type: window + flush load
                    # scales with rows, distributions unchanged
                )
            elif tbl == "documents":
                # suffix every ALTERNATE word with the replica id
                # (replica 0 unchanged): cross-replica Jaccard drops to
                # ~1/3 so replicas are NOT near-dups of each other —
                # the first scheme (append one token) left J≈0.97
                # cross-replica pairs, which made the dedup keys
                # measure a 10x-duplicated corpus (every doc + 9 near
                # copies; prep_full's boilerplate stage then correctly
                # stripped every chunk and returned 0 docs) instead of
                # 10x DATA. Within-replica near-dup structure is
                # untouched; chunk/shingle alignment now differs per
                # replica.
                # alphanumeric suffix: an underscore splits at the word
                # tokenizer's boundary, turning "rI" into every 2nd
                # TOKEN and tripping the Gopher top-word rule for all
                # perturbed replicas (measured: prep_full 10x output
                # collapsed to replica 0 only)
                mark = f"x{i}q"
                perturbed = F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w, j: F.when(
                            (j % 2 == 1) & F.lit(i > 0),
                            F.concat(w, F.lit(mark)),
                        ).otherwise(w),
                    ),
                    " ",
                )
                r = (
                    r.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
                    .withColumn("text", perturbed)
                    .withColumn(
                        "n_chars", F.length("text").cast("bigint")
                    )
                )
            else:  # embeddings
                r = (
                    r.withColumn("vec_id", F.col("vec_id") + F.lit(i * n))
                    # nudge ONE coordinate by a replica-specific
                    # epsilon: kills exact cross-replica clones, keeps
                    # geometry (cells/codes) essentially identical
                    .withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"),
                            lambda x, j: F.when(
                                j == 0, x + F.lit(i * 1e-4)
                            ).otherwise(x).cast("float"),
                        ),
                    )
                )
            parts.append(r)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(dst)
        print(f"# built {dst}: {n} -> {n * replicas} rows", file=sys.stderr)


_SMELLS = ("CartesianProduct", "BatchEvalPython")


def plan_histogram(df) -> dict[str, int]:
    """Operator histogram of the EXECUTED plan (AQE final)."""
    s = df._jdf.queryExecution().executedPlan().toString()
    ops: dict[str, int] = {}
    for m in re.finditer(r"^[\s:+*\-()]*([A-Za-z]+)", s, re.M):
        op = m.group(1)
        if op in (
            "Exchange", "BroadcastExchange", "SortMergeJoin",
            "BroadcastHashJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin",
            "CartesianProduct", "BatchEvalPython", "ArrowEvalPython",
            "FlatMapGroupsInPandas", "Window", "HashAggregate",
            "ObjectHashAggregate", "SortAggregate",
        ):
            ops[op] = ops.get(op, 0) + 1
    return ops


def run_key(spark, qs, key, sf_dir):
    spark.catalog.clearCache()
    qs[key](spark, sf_dir).count()  # warmup
    best, n = float("inf"), 0
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.time()
        df = qs[key](spark, sf_dir)
        n = df.count()
        best = min(best, time.time() - t0)
    return best, n, plan_histogram(df)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--keys", default=",".join(DEFAULT_KEYS))
    args = ap.parse_args()
    out = args.out or f".scratch/sf{args.replicas}x"
    keys = [k for k in args.keys.split(",") if k]

    from tgres_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("rehearse_10x")
    build_10x(spark, out, args.replicas)
    qs = e.queries()

    rows, failures = [], []
    for key in keys:
        t1, n1, h1 = run_key(spark, qs, key, SRC)
        t10, n10, h10 = run_key(spark, qs, key, out)
        ratio = t10 / t1 if t1 else float("inf")
        diff = {
            op: (h1.get(op, 0), h10.get(op, 0))
            for op in sorted(set(h1) | set(h10))
            if h1.get(op, 0) != h10.get(op, 0)
        }
        for s in _SMELLS:
            if h10.get(s, 0) > h1.get(s, 0):
                failures.append(f"{key}: {s} appears only at 10x")
        rows.append((key, t1, n1, t10, n10, ratio, diff))

    print("| key | sf0.1 s | rows | 10x s | rows | time ratio | plan diff (1x→10x) |")
    print("|---|---|---|---|---|---|---|")
    for key, t1, n1, t10, n10, ratio, diff in rows:
        d = (
            "; ".join(f"{op} {a}→{b}" for op, (a, b) in diff.items())
            or "identical op mix"
        )
        print(
            f"| {key} | {t1:.2f} | {n1} | {t10:.2f} | {n10} | "
            f"{ratio:.2f}x | {d} |"
        )
    for f in failures:
        print(f"SMELL-AT-10X {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
