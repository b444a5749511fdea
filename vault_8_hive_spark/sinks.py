"""Object-store sink configuration (the reference's OWT/Swift analog).

The reference ships parsed beacon output to a Swift object store
(honeycomb/owt/hcOwt.py:1-60, owt/swift_upload.py:1-40); the engine's
analog is a partitioned parquet write through the committer stack that is
SAFE for the destination filesystem. The selection logic lives here so it
is real, testable code (tests/test_engine.py exercises it against
file:// — the one destination the sandbox has) rather than prose:
SCALE.md "Object-store sink posture" cross-references this module.

Why committer choice is the whole game on an object store: task commit
via rename() assumes an atomic, O(1) rename — object stores have neither
(S3 "rename" is copy+delete, and the v1 FileOutputCommitter renames twice).
The S3A "magic" committer turns each task commit into completing a
multipart upload: no rename, no copy, job commit is a metadata POST per
file. On a real filesystem (file://, hdfs://) rename IS atomic, so the
default committer with algorithm 2 (task output renamed directly into the
destination at task commit, skipping the per-job second rename pass) is
the right pick.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame

# Hadoop S3A committer stack (jars present on a real deployment's
# classpath via hadoop-aws; absent in this sandbox, which is why
# write_partitioned() refuses s3a:// here instead of failing deep in the
# JVM). Values per the Hadoop S3A committer documentation.
_S3A_COMMITTER_CONF: dict[str, str] = {
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
    # Parquet must route through the path-output committer shim or it
    # silently falls back to its own ParquetOutputCommitter (rename-based).
    "spark.sql.parquet.output.committer.class":
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
    "spark.sql.sources.commitProtocolClass":
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    # Upload tuning: stream parts as they fill; 128 MB parts align with
    # the parquet row-group size so one part ~= one row group.
    "spark.hadoop.fs.s3a.fast.upload": "true",
    "spark.hadoop.fs.s3a.multipart.size": "134217728",
}

# Real-filesystem destinations: atomic rename exists, so the default
# committer is correct — algorithm 2 commits task output straight into
# the destination directory (one rename per task, none per job), the
# standard pick since Hadoop 2.7 wherever rename is atomic.
_RENAME_FS_COMMITTER_CONF: dict[str, str] = {
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
}

_OBJECT_STORE_SCHEMES = frozenset({"s3a", "s3", "s3n", "gs", "abfs", "abfss",
                                   "wasb", "wasbs", "swift", "oss", "cos"})


def committer_conf(dest: str) -> dict[str, str]:
    """Return the write-committer configuration for a destination URI.

    Object-store schemes (s3a://, gs://, abfs://, swift://, ...) get the
    no-rename magic-committer stack; everything with a real rename
    (file://, hdfs://, bare paths) gets FileOutputCommitter algorithm 2.
    Pure function of the URI so the selection itself is unit-testable
    without any network.
    """
    scheme = urlparse(dest).scheme or "file"
    if scheme in _OBJECT_STORE_SCHEMES:
        return dict(_S3A_COMMITTER_CONF)
    return dict(_RENAME_FS_COMMITTER_CONF)


def write_partitioned(
    df: DataFrame,
    dest: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> dict[str, str]:
    """Partitioned parquet write through the committer appropriate for
    `dest`; returns the conf it applied (for callers/tests to assert).

    Config is applied per-write and restored after: committer choice is a
    property of the DESTINATION, not the session, and a session writing
    to both hdfs:// checkpoints and s3a:// output must not leak one
    destination's committer into the other's writes.
    """
    spark = df.sparkSession
    conf = committer_conf(dest)
    scheme = urlparse(dest).scheme or "file"
    if scheme in _OBJECT_STORE_SCHEMES:
        # The sandbox has no object store and no hadoop-cloud jars; fail
        # at the API boundary with the posture documented in SCALE.md
        # instead of a ClassNotFoundException inside the JVM.
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
            )
        except Exception as exc:  # noqa: BLE001 — Py4J error type varies
            raise RuntimeError(
                f"object-store destination {dest!r} needs the spark-hadoop-"
                "cloud committer jars on the classpath (see SCALE.md "
                "'Object-store sink posture')"
            ) from exc
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.option("partitionOverwriteMode", "dynamic").parquet(dest)
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    return conf
