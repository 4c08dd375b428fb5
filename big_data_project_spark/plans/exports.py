"""Frontend JSON export writers — reference-shaped golden files.

Parity: /root/reference/src/optimization/export_suggestions_json.py
(build_route_rows:88-146 nested kpi/suggestion/reasons payload;
export_all:269-296 needs_data filter, top-N cut, action-count summary)
and export_routes_geo.py (nested per-route stop lists). The six files
written here carry the IDENTICAL key trees as the reference's shipped
exports (/root/reference/exports/*.json) — tests/test_exports_golden.py
diffs the shapes file by file.

The heavy lifting — joins, rule evaluation, classification, ranking,
nesting of the geo stop lists — stays in the cluster as Column
expressions (operators/suggestions.py, operators/geo.py); only the
final routes-sized payloads are collected, exactly like the reference's
frontend exporter (which also assembles dicts driver-side from a
latest-hour SQL cut). Writers are deterministic: no timestamps, stable
ordering.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession

# Export payloads are latest-hour / top-N shaped; a mis-wired caller
# must not be able to collect a fact table onto the driver.
MAX_EXPORT_ROWS = 100_000

TOP_N = 20  # EXPORT_TOP_N default, export_suggestions_json.py:273
SUMMARY_TOP = 10  # summary's top_priority cut, export_suggestions_json.py:289

_NEEDS_DATA_REASONS = {"reason": "no suggestion for this route-hour"}


def _collect(df: DataFrame) -> list:
    rows = df.limit(MAX_EXPORT_ROWS + 1).collect()
    if len(rows) > MAX_EXPORT_ROWS:
        raise ValueError(
            f"export payload exceeds {MAX_EXPORT_ROWS} rows — exports are "
            "top-N/summary views; write large relations through "
            "plans/sinks.py instead"
        )
    return rows


def _iso(v):
    return v.isoformat() if hasattr(v, "isoformat") else v


def _f(v):
    """The reference's safe_float (export_suggestions_json.py:171-180):
    NaN/inf normalize to None BEFORE payload assembly — a single NaN
    double would otherwise abort every export file at
    json.dump(allow_nan=False), and a NaN avg_headway_min must
    classify as missing_headway, not ok."""
    if v is None:
        return None
    v = float(v)
    return None if (math.isnan(v) or math.isinf(v)) else v


def _route_payload(r) -> dict:
    """One route_suggestions_latest.json item from a flat
    route_export_rows row (build_route_rows:88-146). Key tree must match
    the golden file exactly; compute_status/compute_message/delta math
    mirror export_suggestions_json.py:149-168,218-225."""
    active = int(r["active_vehicles"] or 0)
    avg_hw = _f(r["avg_headway_min"])
    has_veh, has_hw = active > 0, avg_hw is not None
    if has_veh and has_hw:
        status = "ok"
    elif not has_veh and not has_hw:
        status = "missing_both"
    elif not has_veh:
        status = "missing_vehicles"
    else:
        status = "missing_headway"

    action = r["action"]
    if status != "ok" and action == "needs_data":
        message = "Needs data (no vehicles/headway for this route-hour)"
    elif action == "increase_frequency":
        message = "Increase frequency (over capacity target)"
    elif action == "decrease_frequency":
        message = "Decrease frequency (under-utilized, off-peak)"
    else:
        message = "Keep current frequency"

    cur_hw, rec_hw = _f(r["current_headway_min"]), _f(r["recommended_headway_min"])
    delta_hw = delta_pct = None
    if cur_hw is not None and rec_hw is not None and cur_hw > 0:
        delta_hw = rec_hw - cur_hw
        delta_pct = (rec_hw / cur_hw - 1.0) * 100.0

    if action == "needs_data":
        reasons: dict = dict(_NEEDS_DATA_REASONS)
        confidence = 0.0
    else:
        reasons = {
            "predicted_passengers": _f(r["predicted_passengers"]),
            "observed_passengers": _f(r["observed_passengers"]),
            "active_vehicles": active,
            "avg_headway_min": avg_hw,
            "current_headway_min": cur_hw,
            "trips_per_hour_est": _f(r["trips_per_hour_est"]),
            "capacity_est_per_hour": _f(r["capacity_est_per_hour"]),
            "load_factor_per_hour": _f(r["load_factor_per_hour"]),
            "passengers_per_trip_est": _f(r["passengers_per_trip_est"]),
            "cap_target_per_trip": 45.0,
            "cap_low_per_trip": 24.0,
            "avg_delay_seconds": _f(r["avg_delay_seconds"]) or 0.0,
            "is_peak_hour": int(r["is_peak_hour"] or 0),
            "confidence": _f(r["confidence"]) or 0.0,
            "rule": r["rule"],
        }
        # rule-conditional keys (generate_suggestions.py:164-181): only
        # the two acting rules carry targets — matching the golden
        # file's per-item key set
        if r["trips_per_hour_target"] is not None:
            reasons["trips_per_hour_target"] = _f(r["trips_per_hour_target"])
        if r["raw_recommended_headway_min"] is not None:
            reasons["raw_recommended_headway_min"] = _f(
                r["raw_recommended_headway_min"]
            )
        confidence = reasons["confidence"]

    return {
        "route_id": str(r["route_id"]),
        "hour_ts": _iso(r["hour_ts"]),
        "kpi": {
            "predicted_passengers": _f(r["predicted_passengers"]),
            "observed_passengers": _f(r["observed_passengers"]),
            "active_vehicles": active,
            "avg_headway_min": avg_hw,
            "is_peak_hour": int(r["is_peak_hour"] or 0),
        },
        "suggestion": {
            "action": action,
            "status": status,
            "message": message,
            "current_headway_min": cur_hw,
            "recommended_headway_min": rec_hw,
            "delta_headway_min": delta_hw,
            "delta_headway_pct": delta_pct,
            "priority_score": _f(r["priority_score"]) or 0.0,
            "confidence": confidence,
            "reasons": reasons,
        },
    }


def _write(path: str, payload, pretty: bool = True) -> None:
    with open(path, "w") as f:
        json.dump(
            payload,
            f,
            ensure_ascii=False,
            indent=2 if pretty else None,
            allow_nan=False,
        )


def export_json(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """Write the six reference-shaped export files; returns name→path."""
    from ..operators.geo import routes_geo_export
    from ..operators.kpi import peak_hours_summary
    from ..operators.suggestions import route_export_rows

    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, str] = {}

    rows = sorted(
        (
            _route_payload(r)
            for r in _collect(route_export_rows(spark, sf_dir))
        ),
        key=lambda x: (x["hour_ts"], x["route_id"]),
    )
    needs = [x for x in rows if x["suggestion"]["action"] == "needs_data"]
    real = sorted(
        (x for x in rows if x["suggestion"]["action"] != "needs_data"),
        key=lambda x: (-x["suggestion"]["priority_score"], x["route_id"]),
    )
    summary = {
        "hour_ts": rows[0]["hour_ts"] if rows else None,
        "total_routes": len(rows),
        "needs_data": len(needs),
        "suggestions": len(rows) - len(needs),
        "actions": {
            a: sum(1 for x in rows if x["suggestion"]["action"] == a)
            for a in sorted({x["suggestion"]["action"] for x in rows})
        },
        "top_priority": [
            {
                "route_id": x["route_id"],
                "priority_score": x["suggestion"]["priority_score"],
                "action": x["suggestion"]["action"],
                "message": x["suggestion"]["message"],
            }
            for x in real[:SUMMARY_TOP]
        ],
    }
    peak = [
        {k: _iso(v) for k, v in r.asDict().items()}
        for r in _collect(
            peak_hours_summary(spark, sf_dir).orderBy("hour_of_day")
        )
    ]
    geo = [
        r.asDict(recursive=True)
        for r in _collect(routes_geo_export(spark, sf_dir))
    ]
    for row in geo:
        row["route_id"] = str(row["route_id"])

    files = {
        "route_suggestions_latest.json": rows,
        "needs_data_latest.json": needs,
        "top_priority_latest.json": real[:TOP_N],
        "summary_latest.json": summary,
        "peak_hours_latest.json": peak,
        "routes_geo_latest.json": geo,
    }
    for name, payload in files.items():
        path = os.path.join(out_dir, name)
        _write(path, payload)
        written[name] = path
    return written
