"""Filesystem existence check that works for ANY Hadoop-supported URI
(local, HDFS, S3A, ABFS) — streaming state dirs live wherever the
checkpoint does, and a driver-local os.path probe silently returns False
for remote URIs, which would make every batch look like the first."""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def list_batch_ids(spark: SparkSession, state_dir: str) -> list[int]:
    """Batch ids of the ``batch=N`` partition subdirectories under a
    streaming state dir (any Hadoop URI), sorted ascending. Empty if the
    dir doesn't exist yet."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    ids = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            try:
                ids.append(int(name[len("batch=") :]))
            except ValueError:
                continue
    return sorted(ids)


def delete_path(spark: SparkSession, path: str) -> None:
    """Recursive delete (no-op if absent) through the FileSystem API."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def rename_path(spark: SparkSession, src: str, dst: str) -> bool:
    """FileSystem rename (atomic on HDFS/local for directories)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    ps = jvm.org.apache.hadoop.fs.Path(src)
    pd = jvm.org.apache.hadoop.fs.Path(dst)
    return ps.getFileSystem(conf).rename(ps, pd)
