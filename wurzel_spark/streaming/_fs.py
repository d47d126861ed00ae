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
