"""sources/fs.py — warehouse metadata ops through the Hadoop FileSystem
API (one code path for local paths and object-store URIs). Exercised on
the local filesystem; the API contract (scheme resolution from the Hadoop
conf) is what makes the same calls work on s3a://."""

from __future__ import annotations

import os

from etl_pipeline_last_fm_spark.sources import fs


def test_exists_list_write_delete(spark, tmp_path):
    root = str(tmp_path / "whfs")
    assert fs.list_dir(spark, root) == []
    assert not fs.exists(spark, root)

    marker = os.path.join(root, "v=000001", "_COMMITTED")
    fs.write_text(spark, marker, "2024-04-01")
    assert fs.exists(spark, marker)
    assert fs.list_dir(spark, root) == ["v=000001"]
    with open(marker) as f:  # local scheme: content really landed
        assert f.read() == "2024-04-01"

    # overwrite is create-overwrite, not append
    fs.write_text(spark, marker, "2024-04-02")
    with open(marker) as f:
        assert f.read() == "2024-04-02"

    fs.delete_recursive(spark, os.path.join(root, "v=000001"))
    assert not fs.exists(spark, marker)
    assert fs.list_dir(spark, root) == []
    fs.delete_recursive(spark, os.path.join(root, "absent"))  # no-op, no raise


def test_has_files_with_suffix(spark, tmp_path):
    root = str(tmp_path / "tbl")
    assert not fs.has_files_with_suffix(spark, root, ".parquet")
    fs.write_text(spark, os.path.join(root, "d=1", "part-0.parquet"), "x")
    fs.write_text(spark, os.path.join(root, "_SUCCESS"), "")
    assert fs.has_files_with_suffix(spark, root, ".parquet")
    assert not fs.has_files_with_suffix(spark, root, ".orc")
