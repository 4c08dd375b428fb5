"""Regenerate PLAN_AUDIT.md: per-query physical-plan statistics.

Usage: python tools/plan_audit.py [sf_dir]

Writes PLAN_AUDIT.md atomically (temp file + row-count guard + rename)
so an interrupted run can never truncate the committed table — the
round-2 snapshot commit clipped it to 13 lines via a partial stdout
redirect.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_project_spark.registry import ORACLES, QUERIES
from big_data_project_spark.session import get_spark

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_AUDIT.md",
)


def audit_lines(sf_dir: str) -> list[str]:
    spark = get_spark("plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    lines = [
        "# Physical-plan audit",
        "",
        "Per-query Catalyst physical plan summary at sf0.01 (regenerate:",
        "`python tools/plan_audit.py`). Shuffle count is `Exchange` nodes;",
        "dims joined via broadcast never shuffle the fact side; scans list",
        "pushed parquet filters.",
        "",
        "| query | shuffles | broadcast joins | sort-merge joins "
        "| scans w/ pushed filters | oracle |",
        "|---|---|---|---|---|---|",
    ]
    for q in sorted(QUERIES):
        if q.startswith("rf_"):
            lines.append(f"| {q} | - | - | - | - | rows-only |")
            continue
        plan = (
            QUERIES[q](spark, sf_dir)
            ._jdf.queryExecution()
            .explainString(mode)
        )
        # shuffle exchanges only: count formatted-explain detail headers
        # "(N) Exchange" — BroadcastExchange / ReusedExchange headers
        # must not count as shuffles
        ex_n = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))
        bc = len(re.findall(r"BroadcastHashJoin", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        pushed = len(
            [
                line
                for line in plan.splitlines()
                if "PushedFilters: [" in line
                and "PushedFilters: []" not in line
            ]
        )
        oracle = "full" if q in ORACLES else "rows-only"
        lines.append(f"| {q} | {ex_n} | {bc} | {smj} | {pushed} | {oracle} |")
    return lines


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    lines = audit_lines(sf_dir)
    n_rows = sum(1 for ln in lines if ln.startswith("| ") and " | " in ln) - 1
    if n_rows != len(QUERIES):
        raise SystemExit(
            f"refusing to write PLAN_AUDIT.md: {n_rows} table rows != "
            f"{len(QUERIES)} registered queries (partial run?)"
        )
    tmp = OUT_PATH + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, OUT_PATH)
    print(f"wrote {OUT_PATH}: {n_rows} query rows")


if __name__ == "__main__":
    main()
