"""Single-node baseline replica: the reference engine's idiom (pandas
frames, ``iterrows``/``apply`` row loops — see
/root/reference/src/optimization/generate_suggestions.py:82-203,
/root/reference/src/dag/ml-job.py) re-expressed minimally, timed on the
same parquet inputs bench.py uses. Produces the numbers BASELINE.md
publishes.

This is NOT part of the engine — it exists so "match-or-beat the
reference's single-node throughput" is measured against the reference's
actual compute model (pandas + Python row loops) rather than guessed.
Five pipelines, each mapped to a BENCH headline key:

  q1_pricing_summary  vectorized pandas groupby (reference best case)
  kpi_hourly          events → (route,hour) rollup merges
  suggestions         kpi frame + decide() row loop (reference worst case)
  dedup_exact         md5-per-row hash dedup (hashlib loop)
  token_count         str.split + apply token counting

Usage: python tools/baseline_replica.py [sf_dir]   (default sf0.1)
Prints one JSON line: {"queries": {name: sec}, "rows": {name: n}}.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

import pandas as pd

SF_DIR = (
    sys.argv[1] if len(sys.argv) > 1 else
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)

VEH_CAPACITY = 60.0
TARGET_LOAD = 0.75
LOW_LOAD = 0.25
MIN_HEADWAY, MAX_HEADWAY = 4.0, 60.0


def _read(name: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, f"{name}.parquet"))


def q1_pricing_summary() -> pd.DataFrame:
    li = _read("lineitem")
    li = li[li["l_shipdate"] <= pd.Timestamp("2001-09-02")]
    li = li.assign(
        disc_price=li.l_extendedprice * (1 - li.l_discount),
        charge=li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax),
    )
    return (
        li.groupby(["l_returnflag", "l_linestatus"])
        .agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            avg_qty=("l_quantity", "mean"),
            avg_price=("l_extendedprice", "mean"),
            avg_disc=("l_discount", "mean"),
            count_order=("l_quantity", "size"),
        )
        .reset_index()
    )


def _events() -> pd.DataFrame:
    ev = _read("events")
    ev["hour_ts"] = ev["ts"].dt.floor("h")
    return ev


def kpi_hourly(ev: pd.DataFrame) -> pd.DataFrame:
    """(route, hour) stats + demand merge — the reference's view layer
    built with pandas groupby/merge (ml-job.py idiom)."""
    stats = (
        ev.groupby(["event_type", "hour_ts"])
        .agg(
            trip_update_events=("event_id", "size"),
            avg_delay_seconds=("value", "mean"),
            active_vehicles=("user_id", "nunique"),
        )
        .reset_index()
        .rename(columns={"event_type": "route_id"})
    )
    mapping = (
        ev[["user_id", "event_type"]]
        .drop_duplicates()
        .rename(columns={"user_id": "stop_id", "event_type": "route_id"})
    )
    flow = ev.rename(columns={"user_id": "stop_id"})[
        ["stop_id", "hour_ts", "value"]
    ]
    demand = (
        flow.merge(mapping, on="stop_id")
        .groupby(["route_id", "hour_ts"])["value"]
        .sum()
        .reset_index()
        .rename(columns={"value": "observed_passengers"})
    )
    return stats.merge(demand, on=["route_id", "hour_ts"], how="left")


def _clamp(x: float, lo: float, hi: float) -> float:
    return max(lo, min(hi, x))


def suggestions(kpi: pd.DataFrame) -> list[dict]:
    """The reference's decide() row loop (generate_suggestions.py:106-203):
    one Python dict per (route, hour), rule cascade per row."""
    kpi = kpi.copy()
    kpi["headway_min"] = 60.0 / kpi["active_vehicles"].clip(lower=1)
    out = []
    for _, row in kpi.iterrows():
        headway = float(row["headway_min"])
        tphr = 60.0 / headway if headway > 0 else None
        pred = row["observed_passengers"]
        pred = 0.0 if pred is None or (isinstance(pred, float) and math.isnan(pred)) else float(pred)
        ppt = pred / tphr if tphr else None
        delay_norm = _clamp(float(row["avg_delay_seconds"] or 0) / 600.0, 0, 1)
        cap_target = VEH_CAPACITY * TARGET_LOAD
        action, rec = "keep", headway
        if ppt is not None and ppt > cap_target:
            action = "increase_frequency"
            tphr_target = pred / cap_target
            raw = _clamp(60.0 / tphr_target if tphr_target > 0 else headway * 0.85,
                         MIN_HEADWAY, MAX_HEADWAY)
            rec = _clamp(headway * 0.65 + raw * 0.35, MIN_HEADWAY, MAX_HEADWAY)
        elif ppt is not None and ppt < VEH_CAPACITY * LOW_LOAD:
            action = "decrease_frequency"
            raw = _clamp(headway * 1.15, MIN_HEADWAY, MAX_HEADWAY)
            rec = _clamp(headway * 0.70 + raw * 0.30, MIN_HEADWAY, MAX_HEADWAY)
        over = _clamp(((ppt or 0.0) - cap_target) / cap_target, 0, 1)
        out.append(
            {
                "route_id": str(row["route_id"]),
                "hour_ts": row["hour_ts"],
                "action": action,
                "recommended_headway_min": rec,
                "priority_score": _clamp(0.60 * over + 0.20 * delay_norm, 0, 1),
            }
        )
    return out


def dedup_exact() -> pd.DataFrame:
    docs = _read("documents")
    docs["doc_hash"] = docs["text"].map(
        lambda t: hashlib.md5(" ".join(t.lower().split()).encode()).hexdigest()
    )
    return (
        docs.groupby("doc_hash")
        .agg(keep_doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        .reset_index()
    )


def token_count() -> pd.DataFrame:
    docs = _read("documents")
    docs["n_ws_tokens"] = docs["text"].apply(lambda t: len(t.split()))
    return docs[["doc_id", "n_ws_tokens"]]


def main() -> None:
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        res = fn(*args)
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = len(res)
        return res

    timed("q1_pricing_summary", q1_pricing_summary)
    t0 = time.perf_counter()
    ev = _events()
    kpi = kpi_hourly(ev)
    timings["kpi_hourly"] = round(time.perf_counter() - t0, 3)
    rows["kpi_hourly"] = len(kpi)
    timed("suggestions", suggestions, kpi)
    timed("dedup_exact", dedup_exact)
    timed("token_count", token_count)

    print(json.dumps({"sf_dir": SF_DIR, "queries": timings, "rows": rows}))


if __name__ == "__main__":
    main()
