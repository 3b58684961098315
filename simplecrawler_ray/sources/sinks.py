"""Fetched-output sinks (the FS-mirror cache analogue, S5/S6).

The reference mirrors fetched bodies to disk files whose paths mimic
the site structure (src/cache-backend-fs.ts:142-207) with an index
JSON.  Distributed analogue: the fetched dataset written as parquet
partitioned by host — one directory per host, resumable, no index file
needed (parquet IS the index).  ``sanitise_path`` ports the
path-cleaning column transform (src/cache-backend-fs.ts:20-69) for
deployments that do want file mirroring.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa


def sanitise_path(path: str, content_type: str = "") -> str:
    """sanitisePath src/cache-backend-fs.ts:20-69: hash querystrings,
    hash >=250-char segments, infer an extension from content-type."""
    path = re.sub(r"^/", "", path)
    s = re.sub(r"\s*$", "", path) if path else "index.html"
    if "?" in s:
        resource, _, qs = s.partition("?")
        s = resource + "?" + hashlib.sha1(qs.encode()).hexdigest()
    s = "/".join(
        hashlib.sha1(chunk.encode()).hexdigest() if len(chunk) >= 250 else chunk
        for chunk in s.split("/")
    )
    no_ext = not re.search(r"\.[a-z0-9]{1,6}$", s, re.I)
    is_html = bool(re.match(r"text/html", content_type or "", re.I))
    if no_ext or (is_html and not re.search(r"\.html?$", s, re.I)):
        if is_html:
            s += "index.html" if s.endswith("/") else ".html"
        else:
            m = re.match(r"(image|video|audio|application)/([a-z0-9]+)", content_type or "", re.I)
            if m:
                s += "." + m.group(2)
    return s


def add_cache_path_column(batch: pa.Table) -> pa.Table:
    """Column transform: fetched rows -> mirror-file path."""
    cts = batch.column("state_content_type").to_pylist()
    qs = batch.column("path").to_pylist()
    out = []
    for full, ct in zip(qs, cts):
        # "path" carries path+query (urijs resource()); use it so the
        # querystring is hashed like the reference
        out.append(sanitise_path(full, ct or ""))
    return batch.append_column("cache_path", pa.array(out, pa.string()))


def write_fetched(ds, out_dir: str, partition_by_host: bool = True) -> None:
    """Write the fetched dataset as (optionally host-partitioned) parquet.

    One directory per host => a rerun can skip finished hosts; never one
    giant file (resumable-output rule)."""
    ds = ds.map_batches(add_cache_path_column, batch_format="pyarrow",
                        zero_copy_batch=True)
    if partition_by_host:
        ds.write_parquet(out_dir, partition_cols=["host"])
    else:
        ds.write_parquet(out_dir)
