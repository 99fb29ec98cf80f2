"""Small JSON/text sidecar IO that works on LOCAL and REMOTE stores.

Fragment ancestry (`operators/overlay.py`), keyword metadata
(`sources/keywords.py`) and dataset cards (`apps.py`) ride in one
driver-written sidecar file per store — table-level metadata, never
per-row data.  Driver-local ``open()`` silently broke every remote
(s3a/hdfs) store: reads reported "no sidecar" (ancestry collapsed with
no error) and writes raised AFTER the table data had already landed
(review r9).  These helpers route remote URLs through the JVM Hadoop
filesystem — the same channel the scans use, so any scheme the session
can read, it can read sidecars from.  A jar-less s3 environment raises
loudly here; the boto3 staging fallback (``s3staging``) copies sidecar
files along with the data, so staged reads keep working.
"""

from __future__ import annotations

import os

__all__ = ["read_text", "write_text", "exists"]


def _is_remote(store: str) -> bool:
    # any URL scheme (file:// included) routes through the JVM
    # filesystem — os.path on a scheme-qualified URL is never right
    return "://" in store


def _jvm_fs(path_url: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"reading/writing a sidecar on remote store {path_url!r} "
            "needs an active SparkSession (the JVM Hadoop filesystem "
            "is the remote IO channel)")
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path_url)
    return jpath.getFileSystem(conf), jpath, jvm


def exists(store: str, name: str) -> bool:
    if not _is_remote(store):
        return os.path.exists(os.path.join(store, name))
    fs, jpath, jvm = _jvm_fs(f"{store.rstrip('/')}/{name}")
    return bool(fs.exists(jpath))


def read_text(store: str, name: str) -> str | None:
    """Sidecar contents, or None when absent."""
    if not _is_remote(store):
        path = os.path.join(store, name)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return fh.read()
    fs, jpath, jvm = _jvm_fs(f"{store.rstrip('/')}/{name}")
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # IOUtils keeps this simple and version-stable
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(
            stream, baos, 65536, False)
        out = bytes(baos.toByteArray())
    finally:
        stream.close()
    return out.decode("utf-8")


def write_text(store: str, name: str, text: str) -> None:
    if not _is_remote(store):
        os.makedirs(store, exist_ok=True)
        with open(os.path.join(store, name), "w") as fh:
            fh.write(text)
        return
    fs, jpath, _ = _jvm_fs(f"{store.rstrip('/')}/{name}")
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
