"""Single-key micro-bench: cold + best-of-N steady seconds, noop sink.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/mb.py key [key ...]
       [-n TRIALS]

Mirrors bench.py's protocol (noop sink, min-of-N) for one key at a time
so a rewrite's before/after can be measured without paying the full
53-key headline run. Shares the warm-up so numbers are comparable to
bench.py's steady column, not its cold one.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_project_spark.registry import QUERIES  # noqa: E402
from big_data_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = 5
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
        args = [a for a in args if a != str(n)]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mb")
    from big_data_project_spark.catalog import TABLES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).count()
    for key in args:
        spark.sparkContext.setJobDescription(f"mb:{key}")

        def run():
            QUERIES[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        t0 = time.perf_counter()
        run()
        cold = time.perf_counter() - t0
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            run()
            runs.append(time.perf_counter() - t0)
        rs = "/".join(f"{r:.2f}" for r in runs)
        print(
            f"{key}: cold {cold:.3f}s best {min(runs):.3f}s of [{rs}]",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
