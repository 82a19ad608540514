"""The scheduler-shim example imports and emits the documented
commands WITHOUT Airflow installed (O5 bridge)."""

from __future__ import annotations


def test_airflow_shim_imports_without_airflow():
    import examples.airflow_weather_dag as shim

    # this container has no airflow: the gate must degrade cleanly
    # to None instead of raising at import time
    assert shim.dag is None
    cmds = shim.stage_commands("s3a://b", "s3a://s", "s3a://g", ds="2025-03-02")
    argv = cmds["transform_and_aggregate"]
    assert argv[0] == "spark-submit"
    assert "backfill" in argv
    assert argv[argv.index("--start") + 1] == "2025-03-02"
    assert argv[argv.index("--end") + 1] == "2025-03-02"
    assert argv[argv.index("--bronze") + 1] == "s3a://b"
