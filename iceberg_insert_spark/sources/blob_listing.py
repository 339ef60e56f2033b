"""Source-file listing across storage schemes — SURVEY §2.1 S1/S2.

The reference lists its landing zone two different ways with two different
code paths: the Azure Blob SDK for `abfss://` (App.java:160-183, an
`BlobContainerClient.listBlobsByHierarchy` walk under ``events/<component>/``)
and `java.io.File` for NFS (NfsApp.java:150-162). The Spark-native
equivalent needs neither SDK: the Hadoop FileSystem API already resolves ANY
scheme — ``file://``, ``abfss://``, ``s3a://`` — from the URI plus the
session's Hadoop configuration, so listing is the SAME code for cloud and
local, and the returned paths feed ``spark.read`` directly (executors
re-resolve the scheme themselves; the driver never downloads a byte —
unlike the reference, which pulls every blob through the driver JVM,
App.java:185-193).

In this container there are no cloud credentials, so the `abfss://` branch
cannot be exercised live; `tests/test_blob_listing.py` drives the identical
code path through ``file://`` URIs (scheme resolution, prefix walk, suffix
filter, deterministic ordering). On a real cluster the ONLY change is the
URI and the auth entries in spark.hadoop.* conf — documented below.

Required conf for live ABFS (public Hadoop-Azure settings):
    spark.hadoop.fs.azure.account.auth.type.<acct>.dfs.core.windows.net=OAuth
    spark.hadoop.fs.azure.account.oauth.provider.type...=ClientCredsTokenProvider
    (or account-key / SAS variants) + hadoop-azure on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def list_source_files(
    spark: SparkSession,
    uri: str,
    suffix: str = ".json",
    recursive: bool = True,
) -> list[str]:
    """List data files under ``uri`` (any Hadoop-resolvable scheme), filtered
    by suffix, sorted for deterministic batch order.

    Mirrors the reference's listing semantics (App.java:160-183): prefix
    walk, data files only. Returns fully-qualified URIs so the result can be
    handed to ``spark.read`` regardless of the session's default filesystem.
    The listing itself is driver-side metadata work — O(#files), no data
    movement — exactly like the reference's blob listing, and the one piece
    a 100 TB deployment replaces with a catalog/manifest listing anyway.
    """
    jvm = spark._jvm  # noqa: SLF001 — public Hadoop API via the JVM bridge
    jsc = spark._jsc  # noqa: SLF001
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out: list[str] = []
    it = fs.listFiles(path, recursive)
    while it.hasNext():
        status = it.next()
        p = status.getPath().toString()
        if p.endswith(suffix):
            out.append(p)
    return sorted(out)


def read_listed_json(
    spark: SparkSession,
    files: list[str],
    schema,
) -> DataFrame:
    """Read an explicit file list (from ``list_source_files``) as typed JSON
    with malformed-record drop — the reference's parse semantics
    (DROPMALFORMED, App.java:235-238) over an explicit batch, so a batch is
    exactly the files the lister returned (no racing writers adding files
    between list and read)."""
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(list(files))
    )
