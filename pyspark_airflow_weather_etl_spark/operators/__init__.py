from .merge import collapse_duplicates, upsert  # noqa: F401
from .weather import daily_rollup, flatten_hourly  # noqa: F401
