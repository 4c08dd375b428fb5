"""Regenerate PLAN_AUDIT.md: per-query physical-plan statistics.

Usage: python tools/plan_audit.py [sf_dir] > PLAN_AUDIT.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from big_data_project_spark.registry import ORACLES, QUERIES
from big_data_project_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    print("# Physical-plan audit\n")
    print("Per-query Catalyst physical plan summary at sf0.01 (regenerate:")
    print("`python tools/plan_audit.py`). Shuffle count is `Exchange` nodes;")
    print("dims joined via broadcast never shuffle the fact side; scans list")
    print("pushed parquet filters.\n")
    print(
        "| query | shuffles | broadcast joins | sort-merge joins "
        "| scans w/ pushed filters | oracle |"
    )
    print("|---|---|---|---|---|---|")
    for q in sorted(QUERIES):
        if q.startswith("rf_"):
            print(f"| {q} | - | - | - | - | rows-only |")
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
        print(f"| {q} | {ex_n} | {bc} | {smj} | {pushed} | {oracle} |")


if __name__ == "__main__":
    main()
