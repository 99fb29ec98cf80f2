"""boto3-staged S3 access — the jar-less fallback leg of S10.

The SCALE path for object stores is Spark's native ``s3a://``
filesystem: ``TableStore.apply`` maps fsspec-style
``storage_options`` onto the Hadoop configuration and every executor
streams its own byte ranges (the reference gets the same property
from fsspec + dask, daskms/fsspec_store.py:17-48).  That path needs
the ``hadoop-aws`` + AWS SDK jars on the JVM classpath.

Some environments (dev boxes, hermetic CI, this sandbox) run a
pyspark build without those jars while still having *Python-level*
S3 access (boto3).  This module provides the fallback: stage the
object prefix to local disk through boto3, run the ordinary local
read, and for writes produce locally then upload.  It is explicitly
a BOUNDED-DATA convenience — everything moves through the driver's
disk, so it is for dimension tables, dev round-trips and tests, not
the 100 TB fact scan (the read/write dispatchers warn accordingly).
The switch is automatic: the native path is used whenever the JVM
can load ``S3AFileSystem``; otherwise the stager takes over, so the
same ``xds_from_storage_table("s3://...", storage_options=...)``
call works in both worlds.
"""

from __future__ import annotations

import os
import warnings

__all__ = ["jvm_s3a_available", "boto3_client", "split_bucket_key",
           "download_prefix", "upload_dir", "prefix_exists",
           "delete_prefix", "staging_dir"]

# staging dirs are held here so they live until interpreter exit
# (TemporaryDirectory finalizers clean them) instead of leaking one
# /tmp tree per read
_STAGING: list = []


def staging_dir(prefix: str = "dms_s3_") -> str:
    """A staging directory cleaned up at interpreter exit."""
    import tempfile

    td = tempfile.TemporaryDirectory(prefix=prefix)
    _STAGING.append(td)
    return td.name


def jvm_s3a_available(spark) -> bool:
    """True when the session's JVM can load the s3a filesystem (the
    hadoop-aws jar is on the classpath)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem")
        return True
    except Exception:  # noqa: BLE001 - Py4J wraps ClassNotFound
        return False


def boto3_client(storage_options: dict | None):
    """Build a boto3 S3 client from fsspec-style storage options
    (the same dialect ``TableStore.hadoop_options`` consumes):
    ``key``/``secret``/``token``, ``client_kwargs.endpoint_url``,
    ``region_name``, ``anon``."""
    import boto3
    from botocore import UNSIGNED
    from botocore.config import Config

    opts = dict(storage_options or {})
    client_kwargs = dict(opts.get("client_kwargs") or {})
    kwargs: dict = {}
    if opts.get("key") or opts.get("username"):
        kwargs["aws_access_key_id"] = opts.get("key") or opts.get(
            "username")
    if opts.get("secret") or opts.get("password"):
        kwargs["aws_secret_access_key"] = (opts.get("secret")
                                           or opts.get("password"))
    if opts.get("token"):
        kwargs["aws_session_token"] = opts["token"]
    endpoint = (client_kwargs.get("endpoint_url")
                or opts.get("endpoint_url"))
    if endpoint:
        kwargs["endpoint_url"] = endpoint
    region = client_kwargs.get("region_name") or opts.get("region_name")
    if region:
        kwargs["region_name"] = region
    if opts.get("anon"):
        kwargs["config"] = Config(signature_version=UNSIGNED)
    return boto3.client("s3", **kwargs)


def split_bucket_key(url: str) -> tuple[str, str]:
    """``s3://bucket/a/b`` -> ``("bucket", "a/b")``."""
    rest = url.split("://", 1)[1]
    bucket, _, key = rest.partition("/")
    if not bucket:
        raise ValueError(f"s3 url {url!r} has no bucket")
    return bucket, key.strip("/")


def _iter_keys(client, bucket: str, prefix: str):
    """Objects under ``prefix`` treated as a DIRECTORY: lists
    ``prefix + '/'`` so a sibling key sharing the string prefix
    (``data_v2`` next to ``data``) is never swept in, plus the exact
    key itself (a single-object store, e.g. one .jsonl file)."""
    paginator = client.get_paginator("list_objects_v2")
    dir_prefix = f"{prefix}/" if prefix else ""
    for page in paginator.paginate(Bucket=bucket, Prefix=dir_prefix):
        for obj in page.get("Contents", []):
            yield obj["Key"]
    if prefix:
        try:
            client.head_object(Bucket=bucket, Key=prefix)
            yield prefix
        except Exception:  # noqa: BLE001 - 404: directory-style store
            pass


def download_prefix(url: str, storage_options: dict | None,
                    local_dir: str) -> str:
    """Stage every object under the url's key prefix into
    ``local_dir``, preserving the relative layout; returns the local
    root holding the table."""
    client = boto3_client(storage_options)
    bucket, prefix = split_bucket_key(url)
    warnings.warn(
        f"staging s3://{bucket}/{prefix} through the driver via "
        "boto3 (hadoop-aws jars absent) — bounded-data fallback, "
        "not the 100 TB path", stacklevel=3)
    root = os.path.join(local_dir, os.path.basename(prefix.rstrip("/"))
                        or bucket)
    n = 0
    for key in _iter_keys(client, bucket, prefix):
        rel = key[len(prefix):].lstrip("/") if prefix else key
        dest = os.path.join(root, rel) if rel else root
        os.makedirs(os.path.dirname(dest) or root, exist_ok=True)
        client.download_file(bucket, key, dest)
        n += 1
    if n == 0:
        raise FileNotFoundError(
            f"no objects under s3://{bucket}/{prefix}")
    return root


def prefix_exists(url: str, storage_options: dict | None) -> bool:
    """True when any object exists under the url's key prefix."""
    client = boto3_client(storage_options)
    bucket, prefix = split_bucket_key(url)
    return next(iter(_iter_keys(client, bucket, prefix)), None) \
        is not None


def delete_prefix(url: str, storage_options: dict | None) -> int:
    """Delete every object under the url's key prefix (the remote
    half of ``mode='overwrite'``); returns objects deleted."""
    client = boto3_client(storage_options)
    bucket, prefix = split_bucket_key(url)
    keys = list(_iter_keys(client, bucket, prefix))
    for i in range(0, len(keys), 1000):
        client.delete_objects(
            Bucket=bucket,
            Delete={"Objects": [{"Key": k}
                                for k in keys[i:i + 1000]]})
    return len(keys)


def upload_dir(local_dir: str, url: str,
               storage_options: dict | None) -> int:
    """Upload every file under ``local_dir`` to the url's key prefix,
    preserving the relative layout; returns files uploaded."""
    client = boto3_client(storage_options)
    bucket, prefix = split_bucket_key(url)
    n = 0
    for dirpath, _dirs, names in os.walk(local_dir):
        for name in names:
            # Skip only known local-FS sidecar noise.  A blanket
            # dotfile skip would drop zarr store metadata
            # (.zgroup/.zarray/.zattrs/.zmetadata), uploading an
            # unreadable store.
            if name.endswith(".crc") or name == "_SUCCESS":
                continue
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, local_dir)
            key = f"{prefix}/{rel}".replace(os.sep, "/") if prefix \
                else rel.replace(os.sep, "/")
            client.upload_file(full, bucket, key)
            n += 1
    return n
