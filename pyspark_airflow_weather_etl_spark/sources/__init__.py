from .http import default_fetcher, fetch_distributed, with_retry  # noqa: F401
from .pyds import read_http_source, register_http_json  # noqa: F401
from .tables import load_table, register_views  # noqa: F401
from .writers import (  # noqa: F401
    read_serving_table,
    resolve_serving_version,
    write_jdbc,
    write_parquet_partitioned,
    write_serving_version,
)
