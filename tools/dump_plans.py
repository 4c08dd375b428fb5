"""Dump `.explain("formatted")` for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <suffix> [key ...]

Writes plans/$SPARK_GRAFT_PLAN_TAG (default r10)/<key>_<suffix>.txt for each key (default: every
bench.py HEADLINE key that is a registry query). The judge reads these
files to check plan claims in the round's OPTIMIZATION notes against the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_project_spark.registry import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    keys = sys.argv[2:]
    if not keys:
        import bench

        keys = [k for k in bench.HEADLINE if k in QUERIES]
    from big_data_project_spark.session import get_spark

    spark = get_spark("dump-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_TAG", "r10"),
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for k in keys:
        plan = QUERIES[k](spark, sf_dir)._jdf.queryExecution().explainString(
            mode
        )
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
