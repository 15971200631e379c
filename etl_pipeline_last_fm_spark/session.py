"""SparkSession factory with scale-appropriate defaults.

The reference delegates execution to a single-node Postgres 13
(reference docker-compose.yaml:43-51); here every query is a Catalyst plan.
Defaults below are chosen for correctness-at-scale (SURVEY.md §7 step 7):

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
  which is what survives a 100x scale-up without retuning.
- ``spark.sql.shuffle.partitions`` sized for the local fixtures but expected
  to be overridden (or AQE-coalesced) on a real cluster.
- Arrow enabled so the few pandas-UDF extension operators use vectorized
  batch transfer instead of row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_pipeline_last_fm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes ``None`` and lets spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Self-joins on exploded shingles etc. produce huge intermediate
        # rows; keep broadcast threshold at the default 10MB — dims in this
        # engine are tiny (SURVEY.md §2.4) and get explicit broadcast() hints.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
