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


# Export payloads are top-N / summary shaped; a mis-wired caller must
# not be able to collect a fact table onto the driver.
MAX_EXPORT_ROWS = 100_000


def _rows(df: DataFrame) -> list[dict]:
    collected = df.limit(MAX_EXPORT_ROWS + 1).collect()
    if len(collected) > MAX_EXPORT_ROWS:
        raise ValueError(
            f"export payload exceeds {MAX_EXPORT_ROWS} rows — exports are "
            "top-N/summary views; write large relations through "
            "plans/sinks.py instead"
        )
    return [
        {k: (str(v) if hasattr(v, "isoformat") else v) for k, v in r.asDict().items()}
        for r in collected
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
