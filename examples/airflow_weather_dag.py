"""Sample scheduler mount: the engine's pipeline inside the
reference's Airflow/Docker topology (SURVEY.md §2.8 O5).

The engine deliberately keeps process isolation OUT of query
semantics (pipeline.py docstring): stages compose behind one
SparkSession and a backfill is one range-predicated job. This module
is the bridge for teams that still WANT the reference's topology —
one container per stage, templated on ``{{ ds }}``, serialized runs
(/root/reference/dags/weather_daily_etl.py:59-217): each task shells
into ``spark-submit`` running the engine's CLI, with object-store
credentials passed the same way the reference's DockerOperator
mounts them.

Import-gated: without Airflow installed the module still imports
(``dag is None``) and :func:`stage_commands` stays unit-testable —
tests/test_examples.py pins the emitted commands. Dropped into an
Airflow dags/ folder with Airflow present, ``dag`` is discovered
as ``weather_daily_engine``.
"""

from __future__ import annotations

ENGINE_IMAGE = "spark:4.0"  # any image with the engine wheel installed
STORE_ENV = {
    # the engine side consumes the same AWS_* contract via
    # session.object_store_confs (path-style access, static keys)
    "AWS_ACCESS_KEY_ID": "{{ var.value.store_access_key }}",
    "AWS_SECRET_ACCESS_KEY": "{{ var.value.store_secret_key }}",
    "AWS_ENDPOINT_URL": "{{ var.value.store_endpoint }}",
}


def stage_commands(
    bronze: str, silver: str, gold: str, ds: str = "{{ ds }}"
) -> dict[str, list[str]]:
    """argv per stage — the DockerOperator ``command`` payloads.

    Silver and gold are BOTH served by the engine's ``backfill``
    subcommand with a one-day range (date = plan parameter): the
    scheduler's per-day serialization (``max_active_runs=1`` +
    ``{{ ds }}``) is preserved for teams that rely on it, while a
    real backfill should bypass the DAG and run ONE wide range —
    same CLI, wider --start/--end."""
    backfill = [
        "spark-submit",
        "--master",
        "local[*]",
        "/opt/engine/cli.py",
        "backfill",
        "--bronze",
        bronze,
        "--silver",
        silver,
        "--gold",
        gold,
        "--start",
        ds,
        "--end",
        ds,
    ]
    return {"transform_and_aggregate": backfill}


def build_dag():
    """Construct the Airflow DAG (requires airflow + docker provider;
    raises ImportError without them — callers use the module-level
    ``dag`` which degrades to None)."""
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.providers.docker.operators.docker import DockerOperator

    cmds = stage_commands(
        bronze="s3a://lake/bronze/weather",
        silver="s3a://lake/silver/weather",
        gold="s3a://lake/gold/weather",
    )
    with DAG(
        dag_id="weather_daily_engine",
        start_date=datetime(2025, 1, 1),
        schedule="0 6 * * *",
        catchup=False,
        max_active_runs=1,  # the reference's serialized-runs contract
        default_args={
            # engine fetches already retry per-request
            # (sources.http.with_retry); task-level retry is the
            # scheduler's coarser second line, as in the reference
            "retries": 1,
            "retry_delay": timedelta(minutes=2),
        },
        tags=["bronze", "silver", "gold", "spark"],
    ) as dag:
        prev = None
        for task_id, command in cmds.items():
            t = DockerOperator(
                task_id=task_id,
                image=ENGINE_IMAGE,
                command=command,
                environment=dict(STORE_ENV),
                auto_remove=True,
                mount_tmp_dir=False,
            )
            if prev is not None:
                prev >> t
            prev = t
    return dag


try:
    dag = build_dag()
except ImportError:  # no airflow in this environment
    dag = None
