"""Custom Python DataSource (Spark 4 DataSource API): HTTP JSON.

SURVEY.md §2.1 S1 names the scale path for the reference's
driver-side HTTP fetch (/root/reference/dags/weather_daily_etl.py:
24-33) as "a DataSource V2-style reader"; Spark 4's Python DataSource
API is exactly that surface, so the engine ships the fetch as a real
``spark.read.format("http_json")`` source:

- one ``InputPartition`` per URL → Spark schedules fetches across
  executors and RETRIES a failed partition through normal task retry,
  on top of the per-fetch ``with_retry`` backoff;
- the fetch happens executor-side inside ``read`` — no driver
  bottleneck, no collected payload list;
- ``file://`` URLs work through the same urllib path, which is what
  the offline tests use (this container has no network).

``fetch_distributed`` (mapInPandas over a key DataFrame) remains the
form to use when the URL list is itself a DataFrame; this source is
the idiomatic form when the fetch IS the scan.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .http import default_fetcher

FORMAT_NAME = "http_json"


class HttpJsonDataSource(DataSource):
    """``spark.read.format("http_json")`` — (url, body) rows.

    Options:
      urls       JSON-encoded list of URLs (required)
      timeout_s  per-request timeout, default 30 (the reference's)
      retries    per-fetch retry budget, default 2 (reference's O3)
      backoff_s  base backoff seconds, default 120 (reference's O3)
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "url string, body string"

    def reader(self, schema) -> "HttpJsonReader":
        return HttpJsonReader(self.options)


class HttpJsonReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        urls = json.loads(options.get("urls", "[]"))
        if not urls:
            raise ValueError("http_json requires a non-empty 'urls' option")
        self._urls = urls
        self._timeout_s = int(options.get("timeout_s", "30"))
        self._retries = int(options.get("retries", "2"))
        self._backoff_s = float(options.get("backoff_s", "120"))

    def partitions(self) -> Sequence[InputPartition]:
        # one URL per partition: fetch parallelism == URL count, and a
        # single slow/flaky URL occupies one task, not a batch
        return [InputPartition(u) for u in self._urls]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        fetch = default_fetcher(
            timeout_s=self._timeout_s,
            retries=self._retries,
            backoff_s=self._backoff_s,
        )
        url = partition.value
        yield (url, fetch(url))


def register_http_json(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(HttpJsonDataSource)


def read_http_source(spark, urls: Sequence[str], **options):
    """Convenience wrapper: ``spark.read.format("http_json")`` over
    ``urls``; pair with ``from_json`` + an explicit schema to type the
    payload (never schema inference — SURVEY.md §1.3)."""
    register_http_json(spark)
    reader = spark.read.format(FORMAT_NAME).option("urls", json.dumps(list(urls)))
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
