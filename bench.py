"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall seconds.

Each query is forced to full execution with a count-style collect of the
final plan (no driver-side materialization of wide data).
"""

from __future__ import annotations

import json
import os
import time

from big_data_project_spark.registry import QUERIES
from big_data_project_spark.session import get_spark

# Keys benched since round 2 — keep this list frozen so
# total_r2_keys_sec stays like-for-like across rounds; append new
# rounds' keys to the round lists below instead.
R2_HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_supplier_volume",
    "q6_revenue_delta",
    "q10_returned_items",
    "order_priority_count",
    "top_customers_window",
    "market_share",
    "kpi_hourly",
    "suggestions",
    "headway_hourly",
    "user_sessions",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "token_count",
]
R3_HEADLINE = [
    # round-3 corpus family representatives
    "tfidf_top_terms",
    "dedup_incremental",
]
HEADLINE = R2_HEADLINE + R3_HEADLINE
_R2_KEYS = frozenset(R2_HEADLINE)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    spark = get_spark("bench")

    # Untimed warm-up: JIT the codegen/shuffle paths and touch each input
    # table's footer once, so timings measure steady-state query cost,
    # not one-time JVM/metadata setup (first query otherwise pays ~4 s).
    from big_data_project_spark.catalog import TABLES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).count()

    missing = [n for n in HEADLINE if n not in QUERIES]
    if missing:
        raise SystemExit(f"HEADLINE names not in registry: {missing}")

    # Cold pass: execute every headline query once BEFORE the
    # steady-state trials, and TIME it. This run pays each query's
    # one-time costs — codegen C2 compile, AQE planning, and (for the
    # AMORTIZED queries) materializing the shared rollup tier — so it
    # is the honest first-run number; the steady-state min below is the
    # load-insensitive repeat cost. Reporting both keeps
    # round-over-round deltas like-for-like (round-2 verdict item 4:
    # r01 was cold-ish n=1, r02 was min-of-N post-warm-up — not
    # comparable).
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        cold[name] = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    total = 0.0
    # 5 mandatory trials: under ambient host load (other tenants keep
    # ~4 cores busy) a 3-trial floor still carries ~20-30% cross-process
    # spread on sub-second queries; the min over 5+ trials is stable.
    min_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    max_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPEATS", "15"))
    for name in HEADLINE:
        fn = QUERIES[name]
        # Time a noop-sink write: .count() would let Catalyst prune every
        # aggregate/projection expression (verified — the executed count
        # plan drops the sums entirely), so only a full materializing
        # sink measures the real query cost.
        #
        # Adaptive best-of-N with min-stabilization (JMH-style): repeat
        # until the two fastest runs agree within 2% (or 20 ms for the
        # sub-100ms queries), then report the MIN. Run 1 pays one-time
        # costs (codegen compile, AQE planning, materializing the shared
        # rollup tier); later runs carry transient scheduler/GC noise
        # that only ever ADDS time — the stabilized minimum is the
        # load-insensitive estimate of true query cost, which a fixed
        # median-of-3 wasn't (±15% run-to-run observed in round 1-2).
        runs: list[float] = []
        since_new_min = 0
        while len(runs) < max_repeats:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt_run = time.perf_counter() - t0
            # Track how long the floor has been stable: ambient host
            # load only ever ADDS time, so the min converges from above
            # and "no new floor in 3 trials" is the convergence signal.
            if runs and dt_run < min(runs) * 0.995:
                since_new_min = 0
            else:
                since_new_min += 1
            runs.append(dt_run)
            if len(runs) >= min_repeats and since_new_min >= 3:
                break
        dt = min(runs)
        n = df.count()  # untimed, display only
        timings[name] = round(dt, 3)
        total += dt
        runs_s = "/".join(f"{r:.2f}" for r in runs)
        print(
            f"# {name}: cold {cold[name]:.3f}s, best {dt:.3f}s of "
            f"[{runs_s}] rows={n}",
            flush=True,
        )

    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": round(total, 3),
                "unit": "sec",
                # like-for-like total over the 16 keys benched since
                # round 2 (the round-3 headline adds two corpus keys)
                "total_r2_keys_sec": round(
                    sum(v for k, v in timings.items() if k in _R2_KEYS), 3
                ),
                "queries": timings,
                "queries_cold": cold,
                "total_cold_sec": round(sum(cold.values()), 3),
                # These read the persisted shared rollup tier after the
                # cold pass builds it — their steady number is an
                # amortized read, not the full pipeline (that cost is in
                # queries_cold).
                "amortized": ["kpi_hourly", "suggestions"],
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
