"""Engine configuration — the reference's settings.yaml surface
(/root/reference/config/settings.yaml:4-34) as a typed object, with
the Spark knobs actually wired (the reference declares executor
memory / shuffle partitions but never passes them to spark-submit —
SURVEY.md §2.7 X2/X3).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SourceConfig:
    """HTTP source parameters (reference: settings.yaml:4-10)."""

    base_url: str = "https://api.open-meteo.com/v1/forecast"
    latitude: float = 52.52
    longitude: float = 13.405
    timezone: str = "UTC"
    hourly_metrics: tuple[str, ...] = (
        "temperature_2m",
        "relative_humidity_2m",
        "precipitation",
    )
    timeout_s: int = 30

    def url(self) -> str:
        metrics = ",".join(self.hourly_metrics)
        return (
            f"{self.base_url}?latitude={self.latitude}"
            f"&longitude={self.longitude}&timezone={self.timezone}"
            f"&hourly={metrics}"
        )


@dataclass(frozen=True)
class StorageConfig:
    """Layer paths (reference: bronze/silver/gold buckets,
    settings.yaml:12-18)."""

    bronze_path: str = "data/bronze/openmeteo"
    silver_path: str = "data/silver/openmeteo_hourly"
    gold_path: str = "data/gold/openmeteo_daily"
    partition_keys: tuple[str, ...] = ("y", "m", "d")


@dataclass(frozen=True)
class SparkConfig:
    """Wired Spark knobs (reference declared-but-unwired:
    settings.yaml:21-23)."""

    shuffle_partitions: int | None = None  # default: cores
    driver_memory: str = "16g"
    extra_confs: dict[str, str] = field(default_factory=dict)


@dataclass(frozen=True)
class EngineConfig:
    source: SourceConfig = field(default_factory=SourceConfig)
    storage: StorageConfig = field(default_factory=StorageConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)
