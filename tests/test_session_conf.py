"""Session factory: extra_conf propagation + the s3a recipe's shape."""

from __future__ import annotations

from etl_pipeline_last_fm_spark.session import get_spark, s3a_conf


def test_extra_conf_propagates_to_session(spark):
    s = get_spark(extra_conf={"spark.graft.smoke": "42"})
    assert s.conf.get("spark.graft.smoke") == "42"


def test_s3a_conf_shape():
    conf = s3a_conf(endpoint="http://minio:9000", access_key="ak", secret_key="sk")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    # every key must be builder-passable (spark.*) so the whole dict can go
    # straight into get_spark(extra_conf=...)
    assert all(k.startswith("spark.") for k in conf)


def test_s3a_conf_defaults_to_provider_chain():
    conf = s3a_conf()
    assert "spark.hadoop.fs.s3a.access.key" not in conf
    assert "spark.hadoop.fs.s3a.secret.key" not in conf
    assert "spark.hadoop.fs.s3a.endpoint" not in conf
