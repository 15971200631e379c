"""Warehouse filesystem ops through the Hadoop FileSystem API.

The dim-snapshot commit protocol in pipeline.py needs four tiny
driver-side operations: list a directory, test a path, write a marker
file, delete a retired snapshot. Doing them with ``os``/``open``/``shutil``
worked locally but broke the documented contract that every warehouse
path can be an object-store URI (``s3a://...``, see session.s3a_conf) —
the reference keeps its raw zone in MinIO for exactly that deployment
shape (reference docker-compose.yaml:53-63).

The Hadoop FileSystem API resolves the right implementation per scheme
(RawLocalFileSystem for plain paths, S3AFileSystem for s3a://, HDFS for
hdfs://) from the live Hadoop configuration, so ONE code path serves the
laptop test and the 1000-executor cluster. All calls go through py4j to
the driver JVM — these are metadata ops on a handful of snapshot
directories, never data paths.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_path(spark, path)
    return bool(fs.exists(jpath))


def list_dir(spark: SparkSession, path: str) -> list[str]:
    """Child basenames of ``path`` (empty when the dir is absent)."""
    fs, jpath = _fs_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jpath)]


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Atomically-enough marker write: create-overwrite + close. On object
    stores a PUT is atomic per object, which is the property the commit
    marker needs (it either exists with full content or not at all)."""
    fs, jpath = _fs_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def delete_recursive(spark: SparkSession, path: str) -> None:
    fs, jpath = _fs_path(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def has_files_with_suffix(spark: SparkSession, path: str, suffix: str) -> bool:
    """True when any file under ``path`` (recursive) ends with ``suffix`` —
    the 'does the table have data yet' probe. Uses the recursive
    listFiles iterator, which on S3A is a flat LIST call, not a
    per-directory walk."""
    fs, jpath = _fs_path(spark, path)
    if not fs.exists(jpath):
        return False
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            return True
    return False
