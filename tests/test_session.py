"""Session conf surfaces that are pure assembly (no cluster, no
store): the S3A/object-store profile (SURVEY X5)."""

from __future__ import annotations

from pyspark_airflow_weather_etl_spark.session import object_store_confs


def test_object_store_profile_minio_shape(monkeypatch):
    """A MinIO-style deployment: custom endpoint forces path-style,
    static keys select the simple provider, magic committer wired."""
    for var in (
        "AWS_ENDPOINT_URL",
        "AWS_ACCESS_KEY_ID",
        "AWS_SECRET_ACCESS_KEY",
        "AWS_REGION",
    ):
        monkeypatch.delenv(var, raising=False)
    c = object_store_confs(
        endpoint="http://minio:9000",
        access_key="ak",
        secret_key="sk",
    )
    assert c["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert c["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert c["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert c["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert (
        c["spark.hadoop.fs.s3a.aws.credentials.provider"]
        == "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
    )
    assert c["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert "PathOutputCommitProtocol" in (
        c["spark.sql.sources.commitProtocolClass"]
    )


def test_object_store_profile_env_and_defaults(monkeypatch):
    """Env-var contract: AWS_* variables flow in; real-S3 shape (no
    endpoint) keeps virtual-hosted addressing and the default
    provider chain (no key confs emitted — instance profiles win)."""
    monkeypatch.setenv("AWS_REGION", "eu-west-1")
    monkeypatch.delenv("AWS_ENDPOINT_URL", raising=False)
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    c = object_store_confs(magic_committer=False)
    assert c["spark.hadoop.fs.s3a.path.style.access"] == "false"
    assert c["spark.hadoop.fs.s3a.endpoint.region"] == "eu-west-1"
    assert "spark.hadoop.fs.s3a.endpoint" not in c
    assert "spark.hadoop.fs.s3a.access.key" not in c
    assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in c
    assert "spark.hadoop.fs.s3a.committer.name" not in c
    # a secret never leaks into a non-credential conf value
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "envak")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "envsk")
    c2 = object_store_confs(endpoint="http://ceph:7480")
    assert c2["spark.hadoop.fs.s3a.access.key"] == "envak"
    assert c2["spark.hadoop.fs.s3a.secret.key"] == "envsk"
