"""Data-quality expectations: violation counting semantics on crafted
frames (cross-engine parity is in test_oracle_parity via the entry), and
the one-scan plan guarantee for row-level checks."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_pipeline_last_fm_spark.operators.expectations import (
    Expect,
    run_expectations,
)


def _frame(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 2, 4, 5],
                "parent_id": [10, 10, 20, 99, None],
                "qty": [5.0, -1.0, 3.0, None, 120.0],
                "code": ["A1", "B2", "xx", "C3", "D4"],
            }
        ).astype({"parent_id": "object"})
    )


def test_each_check_kind_counts_correctly(spark):
    df = _frame(spark)
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    checks = [
        Expect("ids_not_null", "not_null", cols=["id", "parent_id"]),
        Expect("qty_in_0_100", "range", cols=["qty"], lo=0, hi=100),
        Expect("code_format", "regex", cols=["code"], pattern="^[A-Z][0-9]$"),
        Expect("qty_pos", "predicate", predicate=F.col("qty") > 0),
        Expect("id_unique", "unique", cols=["id"]),
        Expect("parent_fk", "foreign_key", cols=["parent_id"],
               parent=parent, parent_cols=["pid"]),
    ]
    got = {r["check_name"]: (r["n_violations"], r["n_checked"])
           for r in run_expectations(df, checks).collect()}
    assert got["ids_not_null"] == (1, 5)   # one null parent_id
    assert got["qty_in_0_100"] == (3, 5)   # -1, null, 120
    assert got["code_format"] == (1, 5)    # 'xx'
    # predicate qty>0: NOT(qty>0) is null for null qty -> sum skips it
    assert got["qty_pos"] == (1, 5)        # -1 only
    assert got["id_unique"] == (2, 5)      # both rows of id=2 count
    assert got["parent_fk"] == (2, 5)      # 99 and NULL are unresolvable
    assert all(v[1] == 5 for v in got.values())


def test_row_level_checks_share_one_scan(spark, sf_dir):
    """However many row-level checks are declared, the plan contains
    exactly one lineitem scan."""
    from etl_pipeline_last_fm_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    checks = [
        Expect("a", "not_null", cols=["l_orderkey"]),
        Expect("b", "range", cols=["l_quantity"], lo=1, hi=50),
        Expect("c", "predicate", predicate=F.col("l_extendedprice") > 0),
        Expect("d", "predicate", predicate=F.col("l_discount") <= 1.0),
    ]
    plan = run_expectations(li, checks)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("FileScan parquet") == 1
