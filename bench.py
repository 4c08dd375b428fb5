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
#
# PROTOCOL: HEADLINE *order* is frozen too, not just membership. The
# cold pass runs in list order, and the first query to touch the shared
# rollup tier (kpi_hourly/suggestions) or the persisted LSH pair list
# (dedup_minhash_lsh/dedup_incremental) absorbs that materialization
# into its cold number — so per-query queries_cold deltas are only
# comparable round-over-round if the ordering never changes. Append new
# keys at the END of their round list; never reorder existing ones.
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
R4_HEADLINE = [
    # round-4: first streaming-path key (availableNow end-to-end drain;
    # not a registry query — resolved via _EXTRA below)
    "stream_events_hourly",
    # round-4 additions whose plans were tuned this round: the map-side
    # winnowing sketch and the repartition-pinned flow simulator
    "winnowing_fingerprint",
    "passenger_flow_sim",
    # round-4 behavior/quality families: the single-exchange window
    # funnel and the map-side Gopher rule audit
    "funnel_conversion",
    "gopher_rule_flags",
    # round-4 second batch: the two corpus-scale additions (the PMI
    # join pipeline and the Bloom probe join)
    "token_pmi_bigrams",
    "bloom_dedup_audit",
]
R5_HEADLINE = [
    # round-5: the rewritten rolling-WAU plan (explode equi-join — was a
    # BroadcastNestedLoopJoin), the TPC-H Q21 decorrelation cascade, the
    # token-window substring-dedup pass, and the session-interval
    # explode join
    "dau_rolling_wau",
    "q21_waiting_suppliers",
    "exact_substring_spans",
    "session_concurrency_hourly",
    # round-5 third/fourth batches: the global-ranking ABC window, the
    # map-side basket pair expansion, the interval-explode backlog, and
    # the quality/dup composite (two corpus windows + a doc-grain join)
    "part_revenue_abc",
    "basket_part_pairs",
    "open_orders_monthly",
    "dup_quality_bias",
    # round-5 ninth batch (appended per frozen-order protocol): the
    # one-exchange SCD2 history window and the SemDeDup centroid
    # pipeline (two dims shuffles + output-sized dominance join)
    "scd2_alerts",
    "semdedup_prune",
]
R6_HEADLINE = [
    # round-6: the schema-faithful GTFS-RT FeedMessage decode (two
    # chained Arrow mapInPandas stages, zero shuffles — the Python
    # crossing cost is the thing measured)
    "proto_feed_entities",
    # round-6 second batch (appended per frozen-order protocol): the
    # distributed Lloyd fit (2 unrolled iterations) and the
    # broadcast-ratio DSIR scorer
    "ivf_kmeans_cells",
    "dsir_importance_weights",
    # round-6 third batch (appended per frozen-order protocol): BM25
    # ranked retrieval (vocabulary-filtered tf shuffle) and the
    # margin-based bitext miner (two stacked k-NN window passes)
    "bm25_retrieval_topk",
    "bitext_margin_mining",
    # round-6 fourth batch (appended per frozen-order protocol): the
    # zero-shuffle linear quality gate (map-side feature->sigmoid) and
    # the shingle-grain train->test leakage join
    "quality_classifier_score",
    "split_leakage_audit",
]
R8_HEADLINE = [
    # round-8: the deterministic sketch tier (mergeable histogram
    # quantiles + KMV theta intersection — both one corpus aggregate
    # then sketch-sized work), the RHO bigram-LM selector (persisted
    # bigram stream, three linear aggregates), and the split-conformal
    # interval pass over the shared demand rollup
    "mergeable_quantile_bins",
    "kmv_set_intersection",
    "rho_loss_selection",
    "conformal_interval_coverage",
]
R9_HEADLINE = [
    # round-9: the AMS F2 self-join-size sketch (one (route, user)
    # aggregate then register-sized work), the edit-distance verify
    # tier over LSH candidates (candidate-pair-sized O(len^2) work),
    # and the unrolled alternating NMF rounds (per-round Gram folds,
    # lineage-truncated factors)
    "ams_f2_sketch",
    "dedup_editdist_verify",
    "nmf_topic_rounds",
]
HEADLINE = (
    R2_HEADLINE
    + R3_HEADLINE
    + R4_HEADLINE
    + R5_HEADLINE
    + R6_HEADLINE
    + R8_HEADLINE
    + R9_HEADLINE
)
_R2_KEYS = frozenset(R2_HEADLINE)

# --- sf1 tier (round-6 verdict item 3) -------------------------------------
# At sf0.1 the constant-factor cohort measures Spark's fixed task-
# dispatch floor against a one-allocation pandas pass (BASELINE.md's
# tiled-row experiment shows crossover at ~10^4 rows). The sf1 tier
# re-times every replica-backed key on a 20x tiled dataset
# (tools/make_tiled_sf.py, cached in /tmp) where throughput decides.
# The pandas column is measured ONCE per replica/tile revision
# (tools/baseline_sf1.json — the replica code is frozen between
# rounds; re-running a 6-minute single-core loop per round would just
# re-measure the same constants) and the Spark column is re-measured
# per round. Summary rides the headline line; per-key numbers go to
# BENCH_DETAIL.json's `sf1` block and BASELINE.md.
# Ordered CHEAPEST Spark cost first (measured at tile=20), so the wall
# budget below can only ever truncate the most expensive tail keys —
# never starve a cheap key behind an expensive one.
SF1_KEYS = [
    "kpi_hourly",
    "dedup_exact",
    "suggestions",
    "q1_pricing_summary",
    "part_revenue_abc",
    "token_count",
    "split_leakage_audit",
    "session_concurrency_hourly",
    "dsir_importance_weights",
    "quality_classifier_score",
    "dau_rolling_wau",
    # round-8 sketch additions (replicas value-checked against the
    # DuckDB oracles; pandas column re-measured once at tile=20)
    "mergeable_quantile_bins",
    "kmv_set_intersection",
    # round-9 addition (replica value-checked against the DuckDB
    # oracle; pandas column measured once at tile=20)
    "ams_f2_sketch",
    "bitext_margin_mining",
    "ivf_kmeans_cells",
    "open_orders_monthly",
    "q21_waiting_suppliers",
    "basket_part_pairs",
    "bm25_retrieval_topk",
    "proto_feed_entities",
    "exact_substring_spans",
]


def _run_sf1_tier(spark) -> tuple[dict | None, dict | None]:
    """(headline summary, detail block) for the sf1 tier, or (None,
    None) when disabled. Protocol: cold + best-of-2 steady min per key
    (the full min-stabilization loop would double a tier that exists
    to compare totals, not to chase 2% floors), under a wall budget so
    a contended host can never starve the headline artifact."""
    if os.environ.get("SPARK_GRAFT_SF1", "1") == "0":
        return None, None
    tile = int(os.environ.get("SPARK_GRAFT_SF1_TILE", "20"))
    budget = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET_SEC", "270"))
    from tools.make_tiled_sf import build_tiled_sf

    t_build0 = time.perf_counter()
    sf1_dir = build_tiled_sf(tile=tile)
    build_sec = round(time.perf_counter() - t_build0, 3)
    pandas_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "baseline_sf1.json",
    )
    pandas_q: dict[str, float] = {}
    try:
        with open(pandas_path) as fh:
            baseline = json.load(fh)
        if baseline.get("tile") == tile:
            pandas_q = baseline.get("queries", {})
    except (OSError, ValueError):
        pass
    tier_t0 = time.perf_counter()
    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    cotenant: dict[str, float] = {}
    meter = _CoTenantMeter()
    truncated = False
    for name in SF1_KEYS:
        if time.perf_counter() - tier_t0 > budget:
            truncated = True
            break

        def run():
            df = QUERIES[name](spark, sf1_dir)
            df.write.format("noop").mode("overwrite").save()

        meter.start()
        t0 = time.perf_counter()
        run()
        cold[name] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            runs.append(time.perf_counter() - t0)
        steady[name] = round(min(runs), 3)
        cotenant[name] = round(meter.stop(), 2)
        print(
            f"# sf1 {name}: cold {cold[name]:.3f}s, best {steady[name]:.3f}s"
            f", cotenant_cores {cotenant[name]:.1f}"
            + (
                f", pandas {pandas_q[name]:.3f}s"
                if name in pandas_q
                else ""
            ),
            flush=True,
        )
    shared = [k for k in steady if k in pandas_q]
    le_1x = sum(1 for k in shared if steady[k] <= pandas_q[k])
    cpus_quota = len(os.sched_getaffinity(0))
    sf1_contended = sorted(
        k
        for k, co in cotenant.items()
        if co > CONTENTION_LOAD_FRACTION * cpus_quota
    )
    summary = {
        "tile": tile,
        # totals compare the SAME key set on both engines; when the
        # committed pandas baseline doesn't match this tile, the
        # comparison is meaningless — null totals, not spark-seconds
        # printed next to a zero (round-7 ADVICE)
        "total_spark_sec": round(sum(steady[k] for k in shared), 3)
        if shared
        else round(sum(steady.values()), 3),
        "total_pandas_sec": round(sum(pandas_q[k] for k in shared), 3)
        if shared
        else None,
        "keys_spark_le_pandas": f"{le_1x}/{len(shared)}" if shared else None,
        "truncated": truncated,
    }
    if not shared:
        summary["baseline_mismatch"] = True
    if sf1_contended:
        # count only on the headline line (key-name lists overflow
        # the driver capture); names in the detail block
        summary["n_contended"] = len(sf1_contended)
    detail = {
        "tile": tile,
        "build_sec": build_sec,
        "dir": sf1_dir,
        "contended_keys": sf1_contended,
        "spark_steady": steady,
        "spark_cold": cold,
        "cotenant_cores": cotenant,
        "pandas": pandas_q,
        "ratio_spark_over_pandas": {
            k: round(steady[k] / pandas_q[k], 3) for k in shared
        },
        "truncated": truncated,
    }
    return summary, detail

# --- scale curve (round-8 verdict item 6) ----------------------------------
# The 100 TB design claim, measured instead of argued: the heaviest
# keys re-timed at tile ∈ {1, 20, 60} of the sf0.1 world. Near-linear
# growth is asserted against the work the tiles actually create —
# input grows tile-x, but OUTPUT can grow faster by construction
# (tiled embeddings are exact replicas, so a near-dup key's PAIR list
# grows ~tile²; that is the data's doing, not a plan regression), so
# the bound normalizes by max(input growth, output-row growth).
# Measured out-of-band (SPARK_GRAFT_SCALE_CURVE=1 writes
# tools/scale_curve.json, a committed artifact); every bench run
# embeds the committed artifact into BENCH_DETAIL.json with its
# provenance so the driver's artifact of record carries the curve
# without paying the tile-60 build each round.

SCALE_CURVE_KEYS = [
    "basket_part_pairs",
    "exact_substring_spans",
    "proto_feed_entities",
    "semdedup_prune",
    "q21_waiting_suppliers",
]
SCALE_CURVE_TILES = [1, 20, 60]
# steady(t60)/steady(t20) must stay within this slack of the work
# growth max(3, rows_out growth); a quadratic PLAN would post ~9x on
# 3x input with linear output and fail loudly
SCALE_NEAR_LINEAR_SLACK = 1.6
# Keys whose INTERNAL work unit grows faster than both input and
# output on the tiled data, with the documented growth between tile
# 20 and 60. semdedup_prune: tiled embeddings are EXACT replicas, so
# every LSH bucket holds `tile` copies of each source vector and the
# candidate-pair relation grows (60/20)² = 9x while the prune-decision
# output stays linear — the pair workload is the data's doing, not a
# plan regression (a measured growth at or below this bound shows the
# plan is pair-linear or better).
SCALE_CURVE_WORK_OVERRIDE = {"semdedup_prune": 9.0}
SCALE_CURVE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools", "scale_curve.json"
)


def _measure_scale_curve(spark) -> dict:
    """Time SCALE_CURVE_KEYS at each tile (cold + best-of-2 steady,
    noop sink, co-tenant metered) and record output-row counts so the
    growth bound can normalize by the work actually created."""
    from tools.make_tiled_sf import build_tiled_sf

    meter = _CoTenantMeter()
    sf1_tile = int(os.environ.get("SPARK_GRAFT_SF1_TILE", "20"))
    per_key: dict[str, dict] = {k: {} for k in SCALE_CURVE_KEYS}
    for tile in SCALE_CURVE_TILES:
        dst = (
            "/tmp/spark_graft_sf1"
            if tile == sf1_tile
            else f"/tmp/spark_graft_scale_t{tile}"
        )
        d = build_tiled_sf(dst=dst, tile=tile)
        for name in SCALE_CURVE_KEYS:

            def run():
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()

            meter.start()
            t0 = time.perf_counter()
            run()
            cold = round(time.perf_counter() - t0, 3)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                runs.append(time.perf_counter() - t0)
            cotenant = round(meter.stop(), 2)
            # rows_out AFTER the meter window: the count is a fourth
            # execution and must pollute neither the steady timings'
            # co-tenant attribution nor sit between cold and steady
            rows_out = QUERIES[name](spark, d).count()
            per_key[name][str(tile)] = {
                "cold": cold,
                "steady": round(min(runs), 3),
                "rows_out": rows_out,
                "cotenant_cores": cotenant,
            }
            print(
                f"# scale t{tile} {name}: cold {cold:.3f}s, best "
                f"{per_key[name][str(tile)]['steady']:.3f}s, "
                f"rows_out {rows_out}",
                flush=True,
            )
    growth = {}
    near_linear = {}
    for name in SCALE_CURVE_KEYS:
        s20 = per_key[name]["20"]["steady"]
        s60 = per_key[name]["60"]["steady"]
        r20 = per_key[name]["20"]["rows_out"]
        r60 = per_key[name]["60"]["rows_out"]
        t_growth = round(s60 / s20, 2) if s20 else None
        work_growth = max(
            3.0,
            (r60 / r20) if r20 else 3.0,
            SCALE_CURVE_WORK_OVERRIDE.get(name, 0.0),
        )
        growth[name] = {
            "steady_60_over_20": t_growth,
            "rows_60_over_20": round(r60 / r20, 2) if r20 else None,
            "work_growth": round(work_growth, 2),
        }
        if name in SCALE_CURVE_WORK_OVERRIDE:
            growth[name]["work_override"] = SCALE_CURVE_WORK_OVERRIDE[name]
        near_linear[name] = bool(
            t_growth is not None
            and t_growth <= SCALE_NEAR_LINEAR_SLACK * work_growth
        )
    out = {
        "src_sf": "sf0.1",
        "tiles": SCALE_CURVE_TILES,
        "keys": per_key,
        "growth": growth,
        "near_linear_slack": SCALE_NEAR_LINEAR_SLACK,
        "near_linear": near_linear,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    with open(SCALE_CURVE_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"# scale curve written: {SCALE_CURVE_PATH}")
    return out


def _embed_scale_curve(detail: dict) -> None:
    """Attach the committed curve artifact (if any) to BENCH_DETAIL
    with provenance — re-measure with SPARK_GRAFT_SCALE_CURVE=1."""
    try:
        with open(SCALE_CURVE_PATH) as fh:
            curve = json.load(fh)
    except (OSError, ValueError):
        return
    curve["source"] = (
        "tools/scale_curve.json (committed artifact, measured "
        "out-of-band; SPARK_GRAFT_SCALE_CURVE=1 re-measures)"
    )
    detail["scale_curve"] = curve


# A steady-state timing more than this factor above the previous
# round's is stamped into the headline JSON (round-5 verdict item 7:
# seven r4->r5 key regressions were ambient-load artifacts that the
# 25% `contended` threshold missed — per-key deltas self-report).
REGRESSION_RATIO = 1.25


def _prior_round_queries(sf: float | None) -> tuple[str | None, dict[str, float]]:
    """Steady per-query timings from the NEWEST COMPARABLE
    BENCH_r{N}.json the driver left in the repo root (its `parsed`
    field is that round's headline JSON). Comparable = parsed AND at
    the same scale factor; an unparsed newest artifact (r04's
    truncation) or an sf-mismatched one falls back to the next-newest
    instead of silently disabling the regression self-report.
    Exhausted history degrades to 'no prior' — the bench never fails
    on absent history."""
    import glob
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    numbered: list[tuple[int, str]] = []
    for p in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            numbered.append((int(m.group(1)), p))
    for _n, path in sorted(numbered, reverse=True):
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if not parsed.get("queries"):
            continue
        if sf is not None and parsed.get("sf") != sf:
            continue
        return os.path.basename(path), dict(parsed["queries"])
    return None, {}

# Ambient-load threshold for the `contended` flag: BENCH_r03 was taken
# under ~10x co-tenant load and its absolute numbers were unusable as
# evidence (round-3 verdict item 1). A 1-minute load average above 25%
# of this process's CPU quota BEFORE Spark starts means someone else is
# burning the host; the artifact is stamped so a reader can tell.
CONTENTION_LOAD_FRACTION = 0.25


def _load_snapshot() -> dict:
    """1/5/15-min load averages + the CPU quota visible to this
    process. Pure /proc reads — no Spark involvement."""
    la1, la5, la15 = os.getloadavg()
    return {
        "load_1m": round(la1, 2),
        "load_5m": round(la5, 2),
        "load_15m": round(la15, 2),
        "cpus": len(os.sched_getaffinity(0)),
    }


# --- in-run co-tenant metering (round-7 verdict item 2) ---------------------
# The pre-flight `contended` flag samples load BEFORE Spark starts; r07
# was poisoned by co-tenant load that climbed 6.7 -> 25.3 cores DURING
# the run (27/42 keys "regressed" 1.3-4.6x with no code change). The
# 1-min load average mid-run is useless for flagging — it includes our
# own 32 executor threads. Instead, measure co-tenant CPU directly per
# key window: (host busy jiffies delta − our process-tree jiffies
# delta) / wall. Keys measured above the threshold are flagged, retried
# once at end-of-run, and the headline self-labels.

_CLK_TCK = os.sysconf("SC_CLK_TCK")


def _host_busy_jiffies() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    # cpu: user nice system idle iowait irq softirq steal ...
    v = [int(x) for x in parts[1:9]]
    return v[0] + v[1] + v[2] + v[5] + v[6] + v[7]


def _tree_jiffies() -> int:
    """utime+stime of this process and every live descendant (the
    Spark JVM, pyspark daemons). Dead short-lived children undercount
    SELF, which only ever OVERCOUNTS co-tenant load — flagging stays
    conservative in the safe direction (more retries, never a silently
    poisoned number)."""
    me = os.getpid()
    stats: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as fh:
                s = fh.read()
        except OSError:
            continue
        try:
            rest = s[s.rindex(")") + 2:].split()
            stats[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
        except (ValueError, IndexError):
            continue
    tree = {me}
    changed = True
    while changed:
        changed = False
        for pid, (ppid, _) in stats.items():
            if ppid in tree and pid not in tree:
                tree.add(pid)
                changed = True
    return sum(j for pid, (_, j) in stats.items() if pid in tree)


class _CoTenantMeter:
    """Average co-tenant busy CORES over a start()..stop() window."""

    def start(self) -> None:
        self._t0 = time.monotonic()
        self._h0 = _host_busy_jiffies()
        self._s0 = _tree_jiffies()

    def stop(self) -> float:
        dt = time.monotonic() - self._t0
        if dt <= 0:
            return 0.0
        # A pyspark worker that dies mid-window takes its accumulated
        # jiffies out of the tree sum, making the self delta negative
        # and "other" impossibly large — floor self at 0 and cap the
        # result at the core count (still conservative: undercounted
        # self only ever OVERSTATES co-tenant load).
        self_d = max(0, _tree_jiffies() - self._s0)
        other = (_host_busy_jiffies() - self._h0) - self_d
        cores = max(0.0, other / _CLK_TCK / dt)
        return min(cores, float(len(os.sched_getaffinity(0))))


def _stream_events_hourly_bench(spark, events_dir: str):
    """One full availableNow drain of the streaming hourly rollup into a
    noop sink with a FRESH checkpoint — every trial reprocesses the
    whole feed, so cold and steady numbers measure the same work (the
    stateful-aggregation path: state store + watermark + window)."""
    import tempfile

    from big_data_project_spark.streaming.pipeline import (
        stream_events_hourly,
    )

    sdf = stream_events_hourly(spark, events_dir)
    with tempfile.TemporaryDirectory(prefix="bench_stream_ckpt_") as ckpt:
        q = (
            sdf.writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return sdf


def _cpu_ref_sec() -> float:
    """Fixed single-thread reference workload (md5 over a constant
    buffer) timed best-of-3 — the host-speed yardstick. The co-tenant
    meter catches VISIBLE competing load; a uniformly slower host
    (hypervisor scheduling, frequency scaling) inflates every key by
    the same factor while the meter reads quiet. Comparing this scalar
    across rounds' BENCH_DETAIL.json attributes exactly that case:
    uniform key regressions at a proportionally larger cpu_ref_sec are
    the host, not the plans."""
    import hashlib

    buf = b"spark-graft-cpu-ref" * 64
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = b""
        for _i in range(60000):
            h = hashlib.md5(buf + h).digest()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    # Ambient-load snapshot BEFORE Spark starts: this is the co-tenant
    # load the bench is about to compete with (our own executor threads
    # haven't spun up yet).
    ambient = _load_snapshot()
    cpu_ref = _cpu_ref_sec()
    contended = ambient["load_1m"] > CONTENTION_LOAD_FRACTION * ambient["cpus"]
    if contended:
        print(
            f"# WARNING: ambient 1-min load {ambient['load_1m']} exceeds "
            f"{CONTENTION_LOAD_FRACTION:.0%} of {ambient['cpus']} CPUs — "
            "timings will be inflated by co-tenant work; artifact is "
            "flagged contended=true",
            flush=True,
        )
    spark = get_spark("bench")

    # Untimed warm-up: JIT the codegen/shuffle paths and touch each input
    # table's footer once, so timings measure steady-state query cost,
    # not one-time JVM/metadata setup (first query otherwise pays ~4 s).
    from big_data_project_spark.catalog import TABLES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).count()

    # Untimed setup for the streaming key: the raw events parquet is
    # TIMESTAMP(NANOS) (catalog.py handles the legacy-read dance), so
    # materialize it once through load_table to a micros-typed dir the
    # file stream can read with a plain schema — same pattern as the
    # streaming tests.
    import shutil
    import tempfile

    stream_src_root = tempfile.mkdtemp(prefix="bench_stream_src_")
    # Everything after the temp dir exists runs under try/finally:
    # a failing query must not leak the materialized events copy
    # (multi-GB at larger sf) or the JVM.
    try:
        stream_events_dir = os.path.join(stream_src_root, "events")
        load_table(spark, sf_dir, "events").write.parquet(stream_events_dir)
        _EXTRA = {
            "stream_events_hourly": lambda sp, _sf: _stream_events_hourly_bench(
                sp, stream_events_dir
            ),
        }

        def run_once(name: str):
            """One fully-materialized execution: registry queries write to
            the noop sink; _EXTRA entries (streaming) drain themselves."""
            if name in _EXTRA:
                return _EXTRA[name](spark, sf_dir)
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return df

        missing = [n for n in HEADLINE if n not in QUERIES and n not in _EXTRA]
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
        # Mechanical amortization evidence (round-9 verdict: the static
        # `amortized` list went stale when the dedup memo landed): count
        # the CacheManager registrations each key's COLD run adds — a
        # key that registers a persisted relation is a tier BUILDER
        # whose steady numbers measure post-materialization repeat cost.
        def _n_cached() -> int:
            try:
                return (
                    spark._jsparkSession.sharedState()
                    .cacheManager()
                    .cachedData()
                    .size()
                )
            except Exception:  # noqa: BLE001 — diagnostics only
                return -1

        cold: dict[str, float] = {}
        cache_regs: dict[str, int] = {}
        for name in HEADLINE:
            c0 = _n_cached()
            t0 = time.perf_counter()
            run_once(name)
            cold[name] = round(time.perf_counter() - t0, 3)
            c1 = _n_cached()
            if c1 > c0 >= 0:
                cache_regs[name] = c1 - c0

        timings: dict[str, float] = {}
        loads: dict[str, list[float]] = {}
        cotenant_cores: dict[str, float] = {}
        # 5 mandatory trials: under ambient host load (other tenants keep
        # ~4 cores busy) a 3-trial floor still carries ~20-30% cross-process
        # spread on sub-second queries; the min over 5+ trials is stable.
        min_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
        max_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPEATS", "15"))
        cpus_quota = ambient["cpus"]
        meter = _CoTenantMeter()

        def measure_steady(name: str) -> tuple[float, list[float], float]:
            """(best-of-N steady min, all runs, co-tenant busy cores
            averaged over the measurement window).

            Time a noop-sink write: .count() would let Catalyst prune every
            aggregate/projection expression (verified — the executed count
            plan drops the sums entirely), so only a full materializing
            sink measures the real query cost.

            Adaptive best-of-N with min-stabilization (JMH-style): repeat
            until no new floor appears for 3 trials, then report the MIN.
            Ambient load only ever ADDS time, so the min converges from
            above — "no new floor in 3 trials" is the convergence signal.
            """
            meter.start()
            runs: list[float] = []
            since_new_min = 0
            while len(runs) < max_repeats:
                t0 = time.perf_counter()
                run_once(name)
                dt_run = time.perf_counter() - t0
                if runs and dt_run < min(runs) * 0.995:
                    since_new_min = 0
                else:
                    since_new_min += 1
                runs.append(dt_run)
                if len(runs) >= min_repeats and since_new_min >= 3:
                    break
            return min(runs), runs, meter.stop()

        for name in HEADLINE:
            load_before = _load_snapshot()["load_1m"]
            dt, runs, co = measure_steady(name)
            loads[name] = [load_before, _load_snapshot()["load_1m"]]
            cotenant_cores[name] = round(co, 2)
            timings[name] = round(dt, 3)
            runs_s = "/".join(f"{r:.2f}" for r in runs)
            print(
                f"# {name}: cold {cold[name]:.3f}s, best {dt:.3f}s of "
                f"[{runs_s}] cotenant_cores={co:.1f} load={loads[name]}",
                flush=True,
            )

        # End-of-run retry of contention-flagged keys (round-7 verdict
        # item 2): a key whose measurement window saw co-tenant load
        # above the threshold gets ONE re-measurement; if the retry
        # window is quiet the retry number replaces the poisoned one
        # (min-of-N converges from above, so the better number is
        # always at least as truthful); if the retry is ALSO contended
        # the key stays flagged and the headline self-labels.
        flagged = [
            k
            for k in HEADLINE
            if cotenant_cores[k] > CONTENTION_LOAD_FRACTION * cpus_quota
        ]
        retries: dict[str, dict] = {}
        for name in flagged:
            dt, runs, co = measure_steady(name)
            retries[name] = {
                "steady_sec": round(dt, 3),
                "cotenant_cores": round(co, 2),
            }
            if dt < timings[name]:
                timings[name] = round(dt, 3)
            # the key's reported contention level is the QUIETEST
            # window it was measured under
            cotenant_cores[name] = min(cotenant_cores[name], round(co, 2))
            print(
                f"# retry {name}: best {dt:.3f}s cotenant_cores={co:.1f}",
                flush=True,
            )
        contended_keys = sorted(
            k
            for k in HEADLINE
            if cotenant_cores[k] > CONTENTION_LOAD_FRACTION * cpus_quota
        )
        total = sum(timings.values())

        # Two artifacts (round-4 verdict item 1: the driver tails ~2 KB
        # of stdout, and r04's single ~4 KB line was truncated to
        # "parsed": null — a round's steady-state evidence lost):
        #   - BENCH_DETAIL.json (file, plus a stderr-free earlier note):
        #     bulky diagnostics — per-query cold timings, per-query
        #     [before, after] 1-min load averages, ambient/final load
        #     snapshots, trial protocol constants.
        #   - final stdout line: the COMPACT headline JSON only
        #     (metric/value/total_r2_keys_sec/queries/total_cold_sec/
        #     contended/sf) — well under the capture window.
        # Round-over-round self-report: ratio of this round's steady min
        # to the prior round's, per shared key. Full ratio map goes to
        # the detail file; only >REGRESSION_RATIO moves reach the
        # headline line (with the prior artifact named), so a reader
        # sees regressions without diffing artifacts by hand.
        # sf1 tier AFTER the headline trials (its caches and CPU burn
        # must not pollute the frozen-protocol numbers); only at the
        # default sf0.1 input — env-override runs (probes, sf0.001
        # smoke) skip it.
        sf1_summary, sf1_detail = (None, None)
        if os.path.abspath(sf_dir).rstrip("/") == "/root/testdata/sf0.1":
            # A failing sf1 tier (no /tmp space for the tiled copy, a
            # key erroring on the tiled data) must DEGRADE, never
            # destroy the headline artifact the round is judged on.
            try:
                sf1_summary, sf1_detail = _run_sf1_tier(spark)
            except Exception as exc:  # noqa: BLE001 — degrade to headline-only
                print(f"# sf1 tier failed, continuing: {exc!r}", flush=True)
                sf1_summary, sf1_detail = None, {"error": repr(exc)}

        prior_name, prior_q = _prior_round_queries(sf)
        ratios = {
            k: round(v / prior_q[k], 2)
            for k, v in timings.items()
            if prior_q.get(k)
        }
        regressed = {k: r for k, r in ratios.items() if r > REGRESSION_RATIO}

        detail = {
            "queries_cold": cold,
            "prior_round": prior_name,
            "vs_prior_ratio": ratios,
            "regressed_vs_prior": regressed,
            # Keys whose STEADY numbers read a persisted/memoized tier
            # the cold pass built (full-pipeline cost is queries_cold):
            # the (route, hour) rollup tier (kpi_hourly -> suggestions),
            # the round-9 session-memoized LSH candidate list (the
            # dedup consumers), and the round-10 pinned V layouts +
            # factor inits of nmf_topic_rounds. Every _persisted
            # relation shares this property (CacheManager dedupes by
            # analyzed plan across trials); `amortized_built_by` below
            # is the mechanical evidence — per-key count of cache
            # registrations during the cold pass.
            "amortized": [
                "kpi_hourly",
                "suggestions",
                "dedup_minhash_lsh",
                "dedup_incremental",
                "dedup_editdist_verify",
                "nmf_topic_rounds",
            ],
            "amortized_built_by": cache_regs,
            "ambient_load_frac": round(
                ambient["load_1m"] / ambient["cpus"], 3
            ),
            # host-speed yardstick (see _cpu_ref_sec) — compare across
            # rounds' detail artifacts to attribute uniform drift
            "cpu_ref_sec": cpu_ref,
            # Host-contention evidence (round-3 verdict item 1): ambient
            # load was sampled before Spark started; per-query
            # [before, after] 1-min load averages let a reader attribute
            # any inflated timing to co-tenant work.
            "ambient_load": ambient,
            "load_final": _load_snapshot(),
            "query_load_1m": loads,
            # per-key co-tenant busy cores averaged over the (quietest)
            # measurement window — the in-run contention evidence
            "query_cotenant_cores": cotenant_cores,
            "contended_keys": contended_keys,
            "contention_retries": retries,
            "min_repeats": min_repeats,
            "max_repeats": max_repeats,
        }
        if sf1_detail is not None:
            detail["sf1"] = sf1_detail
        if os.environ.get("SPARK_GRAFT_SCALE_CURVE") == "1":
            try:
                _measure_scale_curve(spark)
            except Exception as exc:  # noqa: BLE001 — degrade, keep headline
                print(f"# scale curve failed, continuing: {exc!r}", flush=True)
        _embed_scale_curve(detail)
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
        print(f"# per-query cold timings + load diagnostics: {detail_path}")
        print(
            json.dumps(
                {
                    "metric": "total_headline_sec",
                    "value": round(total, 3),
                    "unit": "sec",
                    # like-for-like total over the 16 keys benched since
                    # round 2 (later rounds append keys to HEADLINE)
                    "total_r2_keys_sec": round(
                        sum(v for k, v in timings.items() if k in _R2_KEYS), 3
                    ),
                    "queries": timings,
                    "total_cold_sec": round(sum(cold.values()), 3),
                    # `contended` means the bench STARTED on a busy host
                    # (ambient 1-min load above 25% of the CPU quota) and
                    # absolute numbers should not be compared across rounds
                    # (min-of-N still converges from above).
                    "contended": contended,
                    # keys whose EVERY measurement window (initial +
                    # one retry) saw co-tenant CPU above 25% of the
                    # quota — their numbers are inflated by co-tenant
                    # work and self-labeled as such (round-7 verdict:
                    # the pre-flight flag alone let a mid-run load
                    # spike publish noise as regression signal)
                    "contended_during_run": bool(contended_keys),
                    # count only — the key-name list overflows the
                    # driver capture; names in BENCH_DETAIL.json
                    "n_contended": len(contended_keys),
                    # regression summary only — the full >1.25x map and
                    # per-key ratios live in BENCH_DETAIL.json
                    # (`regressed_vs_prior` / `vs_prior_ratio`); a
                    # populated map on THIS line overflowed the
                    # driver's ~2 KB stdout tail at 53 headline keys
                    # (ambient_load_frac and the amortized-keys note
                    # moved there too, same reason)
                    "prior_round": prior_name,
                    "n_regressed": len(regressed),
                    **(
                        {
                            "worst_regression": list(
                                max(regressed.items(), key=lambda kv: kv[1])
                            )
                        }
                        if regressed
                        else {}
                    ),
                    # compact sf1-tier summary (per-key numbers in
                    # BENCH_DETAIL.json's `sf1` block): Spark steady vs
                    # the measured-once pandas replica on the tiled
                    # dataset — the tier where throughput, not task-
                    # dispatch floor, decides
                    **({"sf1": sf1_summary} if sf1_summary else {}),
                    "sf": sf,
                },
                # compact separators: 50+ headline keys at default
                # ", "/": " spacing overflow the driver's ~2 KB stdout
                # tail (test_bench_final_line_fits_driver_capture)
                separators=(",", ":"),
            )
        )
    finally:
        shutil.rmtree(stream_src_root, ignore_errors=True)
        from big_data_project_spark.caching import release_caches

        release_caches()
        spark.stop()


if __name__ == "__main__":
    main()
