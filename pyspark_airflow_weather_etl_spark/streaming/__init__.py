from .dedup import dedup_events_stream, run_streaming_dedup_rollup  # noqa: F401
from .rollup import run_streaming_daily_rollup, streaming_daily_rollup  # noqa: F401
