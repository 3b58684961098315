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
operator the engine swaps in with ``frontier_backend="dataset"``.
The driver only ever holds the WAVE (≤ budget × hosts rows, plus the
over-taken salt spill it re-queues); the remainder stays a Dataset
whose blocks live in the object store.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_HELPER_COLS = ["host_salt", "__take"]


def _split(take: bool):
    def fn(batch: pa.Table) -> pa.Table:
        m = batch.column("__take")
        if not take:
            m = pc.invert(m)
        return batch.filter(m).drop_columns(
            [c for c in _HELPER_COLS if c in batch.column_names])
    return fn


def politeness_dequeue_ds(
    queued: rd.Dataset,
    budget: int,
    hot_hosts: "dict[str, int] | None" = None,
) -> tuple[pa.Table, rd.Dataset, pa.Table]:
    """Return (wave_table, remainder_ds, requeue_table).

    ``hot_hosts``: host -> salt factor k (hosts absent get k=1).  The
    caller derives it from per-host frontier counts (a cheap running
    estimate; `estimate_hot_hosts` is the from-scratch variant).

    ``requeue_table`` holds the salt over-take (rows a hot host's k
    buckets collectively took beyond ``budget``): small (< budget per
    hot host), handed back to the caller's store.  The remainder is
    NEVER gathered — it's a Dataset over the marked blocks.
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
        g = group.sort_values("seq").copy()
        g["__take"] = np.arange(len(g)) < per_bucket
        return g

    salted = queued.map_batches(add_salt, batch_format="pyarrow",
                                zero_copy_batch=True)
    marked = salted.groupby("host_salt").map_groups(
        take_budget, batch_format="pandas").materialize()

    from ..ops import gather_tables

    wave_tables = gather_tables(marked.map_batches(_split(True),
                                                   batch_format="pyarrow"))
    remainder = marked.map_batches(_split(False), batch_format="pyarrow")
    if not wave_tables:
        empty = _empty_like(queued)
        return empty, remainder, empty
    wave = pa.concat_tables(wave_tables, promote_options="default")
    if not hot:
        # no salted hosts: every bucket IS its host and take_budget
        # already capped each at exactly `budget` sorted-by-seq rows —
        # skip the wave-sized pandas sort/groupby round-trip
        return wave, remainder, _empty_like(queued)
    # enforce the exact per-host cap across a hot host's salted buckets
    df = wave.to_pandas()
    taken = df.sort_values("seq").groupby("host", sort=False).head(budget)
    spilled = df.drop(taken.index)
    wave = pa.Table.from_pandas(taken, preserve_index=False)
    requeue = pa.Table.from_pandas(spilled, preserve_index=False)
    return wave, remainder, requeue


#: w<=0 gathers the WHOLE frontier to the driver; past this many rows
#: that's a scale foot-gun, so the dequeue refuses with guidance
#: (round-3 verdict #3) instead of silently OOMing the driver.
GATHER_GUARD_ROWS = 1_000_000


def dequeue_oldest_ds(queued: rd.Dataset, w: int,
                      gather_guard_rows: int = GATHER_GUARD_ROWS,
                      ) -> tuple[pa.Table, rd.Dataset]:
    """Global W oldest rows by seq (the budget=0 / max_wave_rows path).

    Two thin passes, no full gather: (1) per-block local head-W of the
    seq column only -> driver merges ≤ W×blocks int64s and picks the
    global W-th seq as cutoff; (2) filter blocks by the cutoff — wave
    gathered (exactly ≤W rows, seqs are unique), remainder stays a
    Dataset.  ``w == 0`` means take everything — small frontiers only:
    past ``gather_guard_rows`` rows this raises instead of gathering
    the whole frontier to the driver (set ``max_wave_rows`` / a
    positive ``w``, or raise the guard explicitly).
    """
    from ..ops import gather_tables

    mat = queued.materialize()
    if w <= 0:
        n = mat.count()  # block metadata — no row transit
        if gather_guard_rows and n > gather_guard_rows:
            raise ValueError(
                f"dequeue_oldest_ds(w<=0) would gather the whole "
                f"{n}-row frontier to the driver (guard: "
                f"{gather_guard_rows}).  Set max_wave_rows (engine) / "
                "a positive w, or pass a larger gather_guard_rows.")
        tables = gather_tables(mat)
        wave = (pa.concat_tables(tables, promote_options="default")
                if tables else _empty_like(queued))
        # blocks arrive in bucket order, not insertion order — sort by seq
        # so multi-host conformance waves stay FIFO (matches the driver
        # backend's fetch order / candidate seq stamping).
        if wave.num_rows:
            wave = wave.take(
                pc.sort_indices(wave, sort_keys=[("seq", "ascending")]))
        return wave, rd.from_arrow(wave.schema.empty_table())

    def local_seqs(batch: pa.Table) -> pa.Table:
        s = np.sort(batch.column("seq").to_numpy(zero_copy_only=False))
        return pa.table({"seq": pa.array(s[:w], pa.int64())})

    seq_tables = gather_tables(mat.map_batches(local_seqs, batch_format="pyarrow",
                                               zero_copy_batch=True))
    all_seqs = (np.sort(np.concatenate(
        [t.column("seq").to_numpy(zero_copy_only=False) for t in seq_tables]))
        if seq_tables else np.array([], dtype=np.int64))
    if len(all_seqs) == 0:
        empty = _empty_like(queued)
        return empty, rd.from_arrow(empty.schema.empty_table())
    cutoff = int(all_seqs[min(w, len(all_seqs)) - 1])

    def keep(flag: bool):
        def fn(batch: pa.Table) -> pa.Table:
            m = pc.less_equal(batch.column("seq"), cutoff)
            return batch.filter(m if flag else pc.invert(m))
        return fn

    wave_tables = gather_tables(mat.map_batches(keep(True), batch_format="pyarrow",
                                                zero_copy_batch=True))
    wave = pa.concat_tables(wave_tables, promote_options="default")
    wave = wave.take(pc.sort_indices(wave, sort_keys=[("seq", "ascending")]))
    remainder = mat.map_batches(keep(False), batch_format="pyarrow",
                                zero_copy_batch=True)
    return wave, remainder


def _empty_like(ds: rd.Dataset) -> pa.Table:
    from ..schemas import FRONTIER_SCHEMA

    try:
        sch = ds.schema()
        return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    except Exception:
        return FRONTIER_SCHEMA.empty_table()


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
