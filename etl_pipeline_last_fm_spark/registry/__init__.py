"""Query/oracle registry, split by tier (round-5 hygiene). The graded
ordering and the driver contract live in __spark_entry__.py."""

from etl_pipeline_last_fm_spark.registry import (
    core,
    extras,
    llm,
    round5,
    round6,
    round7,
)

__all__ = ["core", "extras", "llm", "round5", "round6", "round7"]
