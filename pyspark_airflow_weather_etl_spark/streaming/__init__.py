from .rollup import run_streaming_daily_rollup, streaming_daily_rollup  # noqa: F401
