"""Deterministic job-dependency executor: the reference's Airflow
layer re-expressed minimally.

Parity target: the reference schedules eight Airflow DAGs
(reference src/dag/*.py — gtfs-static-job daily,
mock_passenger_flow_job / weather-job / build-kpi-job / ml-job /
generate-suggestions-job / export-suggestions-json-job hourly,
export-routes-geo-job daily), each a linear TaskFlow chain, with the
cross-job ordering implicit in their schedules (KPI views must exist
before the ML job reads them, suggestions before the export). This
module makes that ordering EXPLICIT and testable: a tiny DAG runner
with Airflow's failure semantics (a failed job marks every transitive
downstream ``upstream_failed``; independent branches keep running) and
the reference's job graph declared job-for-job.

This is an orchestration seam, not a compute engine: each job body is
one of the repo's existing lazy queries materialized to the lake (or
a JSON export), so reruns are idempotent the same way the reference's
ON CONFLICT writes are. Scheduling (the @hourly trigger itself) stays
out of scope — any cron owner can call ``run_dag`` on a schedule; what
the engine owns is the dependency contract between jobs.

Scale: the runner is O(jobs) driver-side bookkeeping; all data volume
stays inside the Spark jobs it launches.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class Job:
    """One schedulable unit: ``fn(spark)`` plus its upstream names."""

    name: str
    fn: Callable[[SparkSession], object]
    deps: tuple[str, ...] = field(default_factory=tuple)


def _topo_order(jobs: Sequence[Job]) -> list[str]:
    """Kahn's algorithm with a SORTED ready set, so the execution
    order is a pure function of the graph — no dict-order or
    registration-order dependence. Raises on duplicate names, unknown
    deps, and cycles (naming the stuck jobs)."""
    by_name = {}
    for j in jobs:
        if j.name in by_name:
            raise ValueError(f"duplicate job name: {j.name}")
        by_name[j.name] = j
    for j in jobs:
        unknown = [d for d in j.deps if d not in by_name]
        if unknown:
            raise ValueError(f"job {j.name} depends on unknown: {unknown}")
    remaining = {j.name: set(j.deps) for j in jobs}
    order: list[str] = []
    while remaining:
        ready = sorted(n for n, deps in remaining.items() if not deps)
        if not ready:
            stuck = sorted(remaining)
            raise ValueError(f"dependency cycle among: {stuck}")
        for n in ready:
            order.append(n)
            del remaining[n]
        for deps in remaining.values():
            deps.difference_update(ready)
    return order


def run_dag(
    spark: SparkSession, jobs: Sequence[Job]
) -> list[dict[str, object]]:
    """Run the jobs in deterministic topological order. Airflow
    failure semantics: a job that raises is recorded ``failed`` (with
    the error), every transitive downstream is ``upstream_failed`` and
    never runs, and independent branches continue. Returns one report
    row per job in execution order: name, status, seconds, error,
    deps."""
    by_name = {j.name: j for j in jobs}
    order = _topo_order(jobs)
    status: dict[str, str] = {}
    report: list[dict[str, object]] = []
    for name in order:
        job = by_name[name]
        bad = [d for d in job.deps if status.get(d) != "success"]
        row: dict[str, object] = {
            "name": name,
            "deps": list(job.deps),
            "seconds": 0.0,
            "error": None,
        }
        if bad:
            status[name] = "upstream_failed"
            row["status"] = "upstream_failed"
            row["error"] = f"upstream not successful: {sorted(bad)}"
        else:
            t0 = time.perf_counter()
            try:
                job.fn(spark)
                status[name] = "success"
                row["status"] = "success"
            except Exception as exc:  # noqa: BLE001 — report, don't mask
                status[name] = "failed"
                row["status"] = "failed"
                row["error"] = f"{type(exc).__name__}: {exc}"
            row["seconds"] = round(time.perf_counter() - t0, 3)
        report.append(row)
    return report


def _write_query(name: str, sf_dir: str, out_dir: str):
    """Job body: materialize one registry query to the lake —
    idempotent (mode=overwrite), all volume executor-side."""

    def _run(spark: SparkSession) -> None:
        from ..registry import QUERIES

        QUERIES[name](spark, sf_dir).write.mode("overwrite").parquet(
            f"{out_dir}/{name}"
        )

    return _run


def reference_hourly_dag(sf_dir: str, out_dir: str) -> list[Job]:
    """The reference's eight-DAG graph, job-for-job, with the implicit
    schedule ordering made explicit:

    - gtfs_static_job (gtfs-static-job.py): static tables validated +
      normalized -> referential_filter.
    - mock_passenger_flow_job (mock_passenger_flow_job.py): simulated
      demand feed -> passenger_flow_sim.
    - weather_job (weather-job.py): hourly weather profile.
    - build_kpi_job (build-kpi-job.py): KPI views over the ingested
      feeds — needs all three feeds above.
    - ml_job (ml-job.py): demand model predictions over the ML view —
      needs the KPI tier.
    - generate_suggestions_job (generate-suggestions-job.py): the
      decide() cascade over KPIs + predictions.
    - export_suggestions_json_job / export_routes_geo_job
      (export-*-job.py): serving exports, downstream of their
      producers.
    """
    from .exports import export_json

    def _exports(spark: SparkSession) -> None:
        export_json(spark, sf_dir, f"{out_dir}/exports")

    return [
        Job("gtfs_static_job", _write_query("referential_filter", sf_dir, out_dir)),
        Job(
            "mock_passenger_flow_job",
            _write_query("passenger_flow_sim", sf_dir, out_dir),
        ),
        Job("weather_job", _write_query("weather_hourly", sf_dir, out_dir)),
        Job(
            "build_kpi_job",
            _write_query("kpi_hourly", sf_dir, out_dir),
            ("gtfs_static_job", "mock_passenger_flow_job", "weather_job"),
        ),
        Job(
            "ml_job",
            _write_query("rf_demand_predictions", sf_dir, out_dir),
            ("build_kpi_job",),
        ),
        Job(
            "generate_suggestions_job",
            _write_query("suggestions", sf_dir, out_dir),
            ("build_kpi_job", "ml_job"),
        ),
        Job(
            "export_suggestions_json_job",
            _exports,
            ("generate_suggestions_job",),
        ),
        Job(
            "export_routes_geo_job",
            _write_query("routes_geo", sf_dir, out_dir),
            ("gtfs_static_job",),
        ),
    ]
