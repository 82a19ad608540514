"""HTTP REST source (SURVEY.md §2.1 S1).

The reference fetches one Open-Meteo document per day on the Airflow
worker (/root/reference/dags/weather_daily_etl.py:24-33) and writes
it to object storage. Here the fetch is an injectable callable so the
source is testable offline, and the parsed payloads enter Spark as an
explicit-schema DataFrame (no inference pass).

Scale note: one document per (location, day) is driver-trivial; for
many thousands of fetch keys, distribute the I/O itself with
``fetch_distributed`` — a mapInPandas over the key table so each
executor fetches its partition's URLs (the DataSource-V2-style
pattern without a custom connector).
"""

from __future__ import annotations

import json
import time
import zlib
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

from .. import schemas

Fetcher = Callable[[str], str]


class FetchFailed(RuntimeError):
    """A fetch exhausted its retry budget; ``__cause__`` is the last
    underlying error."""


def with_retry(
    fetch: Fetcher,
    retries: int = 2,
    backoff_s: float = 120.0,
    jitter: float = 0.1,
    sleep: Callable[[float], None] = time.sleep,
) -> Fetcher:
    """Bounded exponential backoff around a fetcher — the engine-level
    form of the reference's task-level retry contract (O3:
    /root/reference/dags/weather_daily_etl.py:53-57, retries 1-2 at
    2 min). The reference restarts the whole Airflow task; here the
    retry wraps the single fetch, so inside ``fetch_distributed`` one
    flaky URL no longer fails the whole partition's task (and with it
    the Spark stage).

    Delay for attempt k is ``backoff_s·2ᵏ`` plus a DETERMINISTIC
    jitter fraction derived from (url, attempt) — spreads a thundering
    herd of executors without introducing nondeterminism. ``sleep`` is
    injectable for tests. After ``retries`` re-attempts the last error
    propagates as ``FetchFailed`` with the cause chained."""

    def fetch_with_retry(url: str) -> str:
        attempt = 0
        while True:
            try:
                return fetch(url)
            except Exception as e:  # noqa: BLE001 — any failure retries
                if attempt >= retries:
                    raise FetchFailed(
                        f"fetch failed after {retries + 1} attempts: {url}"
                    ) from e
                frac = (
                    zlib.crc32(f"{url}#{attempt}".encode()) % 1000
                ) / 1000.0
                sleep(backoff_s * (2**attempt) * (1.0 + jitter * frac))
                attempt += 1

    return fetch_with_retry


def default_fetcher(
    timeout_s: int = 30,
    retries: int = 2,
    backoff_s: float = 120.0,
) -> Fetcher:
    """GET with the reference's 30 s timeout + raise-on-non-2xx
    contract (weather_daily_etl.py:31-33), wrapped in the O3 retry
    policy (retries 2 @ 2 min backoff). Import-gated: this container
    has no network."""

    def fetch(url: str) -> str:
        import urllib.request

        with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
            # status is None for non-HTTP schemes (file:// in tests)
            if resp.status is not None and not 200 <= resp.status < 300:
                raise RuntimeError(f"HTTP {resp.status} for {url}")
            return resp.read().decode("utf-8")

    return with_retry(fetch, retries=retries, backoff_s=backoff_s)


def read_http_json(
    spark: SparkSession,
    urls: Sequence[str],
    fetcher: Fetcher,
    schema=None,
) -> DataFrame:
    """Fetch each URL (driver-side — for small key sets) and parse the
    JSON documents into a typed DataFrame."""
    payloads = [json.loads(fetcher(u)) for u in urls]
    return spark.createDataFrame(payloads, schema or schemas.BRONZE_WEATHER)


def fetch_distributed(
    keys: DataFrame, url_col: str, fetcher_factory: Callable[[], Fetcher]
) -> DataFrame:
    """Executor-side fetch: each partition fetches its own URLs.

    Returns (url, body) rows; follow with ``from_json`` + an explicit
    schema. ``fetcher_factory`` is called once per worker (connection
    pooling), not per row.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        fetch = fetcher_factory()
        for pdf in batches:
            yield pd.DataFrame(
                {"url": pdf[url_col], "body": pdf[url_col].map(fetch)}
            )

    return keys.mapInPandas(run, "url string, body string")
