"""Frontend JSON export writers.

Parity: /root/reference/src/optimization/export_suggestions_json.py
(latest-hour payload, top-N by priority, action-count summary,
needs-data classification, 24 h peak profile) and
export_routes_geo.py (nested per-route stop lists).

The heavy lifting — joins, classification, ranking — stays in the
cluster as the registered operators; only the final small payloads
(top-N rows, 24-hour profiles) are collected, exactly like the
reference's frontend files. Writers are deterministic: no timestamps,
keys sorted.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..registry import QUERIES

EXPORTS = {
    "suggestions_payload": ("top_priority", "suggestions"),
    "summary": ("summary_actions", "summary"),
    "needs_data": ("needs_data", "routes"),
    "peak_hours": ("peak_hours_summary", "profile"),
    "routes_geo": ("routes_geo", "features"),
}


def _rows(df: DataFrame) -> list[dict]:
    return [
        {k: (str(v) if hasattr(v, "isoformat") else v) for k, v in r.asDict().items()}
        for r in df.collect()
    ]


def export_json(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """Write every export payload as a JSON file; returns name -> path."""
    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, str] = {}
    for export_name, (query_name, payload_key) in EXPORTS.items():
        payload = {payload_key: _rows(QUERIES[query_name](spark, sf_dir))}
        path = os.path.join(out_dir, f"{export_name}.json")
        with open(path, "w") as f:
            json.dump(payload, f, sort_keys=True, default=str)
        written[export_name] = path
    return written
