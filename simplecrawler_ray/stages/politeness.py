"""Distributed politeness dequeue with host-bucket salting (O1 at scale).

At 10^10-URL frontier scale the per-round dequeue is a
``groupby(host)`` shuffle; a hot host (Zipf head) concentrates its
whole group on one reducer.  Mitigation (north rule): salt hot hosts
into ``host#k`` sub-buckets so the exchange balances, while the
per-host budget stays exact — each of a host's k buckets gets
``ceil(budget / k)`` of the budget and a final per-host cap is applied
when the sub-waves merge (cheap: at most ``budget`` rows per host
survive).

The driver engine uses the vectorized in-memory equivalent
(`CrawlEngine._dequeue_wave`); this module is the Dataset-shaped
operator for frontiers that do not fit one node, and is what the
engine swaps in when the queued frontier is a Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def politeness_dequeue_ds(
    queued: rd.Dataset,
    budget: int,
    hot_hosts: "dict[str, int] | None" = None,
) -> tuple[pa.Table, rd.Dataset]:
    """Return (wave_table, remainder_ds).

    ``hot_hosts``: host -> salt factor k (hosts absent get k=1).  The
    caller derives it from per-host frontier counts (a cheap
    ``groupby(host).count()`` or a running estimate).
    """
    hot = hot_hosts or {}

    def add_salt(batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        hashes = batch.column("url_hash").to_numpy(zero_copy_only=False)
        salts = [
            f"{h}#{int(x) % hot[h]}" if h in hot and hot[h] > 1 else h
            for h, x in zip(hosts, hashes)
        ]
        return batch.append_column("host_salt", pa.array(salts, pa.string()))

    def take_budget(group: pd.DataFrame) -> pd.DataFrame:
        k = hot.get(group["host"].iloc[0], 1)
        per_bucket = -(-budget // k)  # ceil
        g = group.sort_values("seq")
        g = g.copy()
        g["__take"] = np.arange(len(g)) < per_bucket
        return g

    salted = queued.map_batches(add_salt, batch_format="pyarrow",
                                zero_copy_batch=True)
    marked = salted.groupby("host_salt").map_groups(take_budget,
                                                    batch_format="pandas")
    from ..ops import gather_tables

    tables = gather_tables(marked)
    if not tables:
        return pa.table({}), queued
    merged = pa.concat_tables(tables, promote_options="default").to_pandas()
    taken = merged[merged["__take"]]
    # enforce the exact per-host cap across salted buckets
    taken = (taken.sort_values("seq").groupby("host", sort=False)
             .head(budget))
    rest = pd.concat([merged[~merged["__take"]],
                      merged[merged["__take"]].drop(taken.index)])
    drop_cols = ["host_salt", "__take"]
    wave = pa.Table.from_pandas(taken.drop(columns=drop_cols),
                                preserve_index=False)
    remainder = rd.from_arrow(
        pa.Table.from_pandas(rest.drop(columns=drop_cols), preserve_index=False))
    return wave, remainder


def estimate_hot_hosts(queued: rd.Dataset, salt_threshold: int = 10_000,
                       max_salt: int = 16) -> dict[str, int]:
    """host -> salt factor for hosts with > threshold queued rows."""
    counts = queued.groupby("host").count().to_pandas()
    col = "count()" if "count()" in counts.columns else counts.columns[-1]
    out = {}
    for _, row in counts.iterrows():
        n = int(row[col])
        if n > salt_threshold:
            out[row["host"]] = min(max_salt, -(-n // salt_threshold))
    return out
