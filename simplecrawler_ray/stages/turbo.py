"""Turbo round stage: the whole per-round pipeline fused into ONE
``map_batches`` UDF for the scale path.

Per input batch of queued frontier rows, inside the task:
  fetch -> parse/discover -> canonicalize -> domain/robots/depth filters
  -> global dedup (RPC to the sharded seen-set actors) -> seq stamp
and the fetched rows (with payloads) are written DIRECTLY to the
parquet sink from the worker — they never travel to the driver.  The
task returns only the thin new-frontier rows (the next wave).

This trades the conformance mode's exact FIFO ordering for one dataset
execution per round and near-zero driver work:

* ``seq`` is hash-stamped: ``(round+1) << 42 | (url_hash & MASK)`` —
  monotone ACROSS rounds (BFS order preserved), arbitrary within a
  round.  Use the default engine mode when reference-exact ordering
  matters (tests); use turbo for throughput (bench / production).
* duplicate-candidate ties within a round are won by whichever task
  reaches the seen shard first (the reference's first-wins per
  arrival order — arrival order is just no longer deterministic).

Politeness still holds: the driver applies the per-host budget when
building the next wave from the returned rows.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..schemas import FRONTIER_SCHEMA
from .candidates import CandidateProcessor, candidates_to_frontier_rows, explode_discovered
from .fetch import _WORKER_CACHE, _ref_key, Fetcher

_SEQ_MASK = (1 << 42) - 1


def turbo_round_udf(batch: pa.Table, *, web_ref, cfg_ref, robots_ref,
                    seen_shards, round_no, sink_dir, metrics_actor=None) -> pa.Table:
    key = ("turbo", _ref_key(web_ref), _ref_key(cfg_ref), _ref_key(robots_ref))
    st = _WORKER_CACHE.get(key)
    if st is None:
        for k in [k for k in _WORKER_CACHE if k[0] == "turbo"]:
            del _WORKER_CACHE[k]
        st = (Fetcher(web_ref, cfg_ref, None, None),
              CandidateProcessor(cfg_ref, robots_ref))
        _WORKER_CACHE[key] = st
    fetcher, proc = st
    cfg = fetcher.cfg

    fetched = fetcher(batch)

    # sink the fetched rows from the worker (resumable per-round layout)
    if sink_dir:
        rdir = os.path.join(sink_dir, f"round={round_no:05d}")
        os.makedirs(rdir, exist_ok=True)
        out = fetched.drop_columns(["discovered"])
        pq.write_table(out, os.path.join(rdir, f"part-{uuid.uuid4().hex}.parquet"))

    raw = explode_discovered(fetched, cfg.get("max_depth", 0))
    counters = {"fetchstart": batch.num_rows}
    for d in fetched.column("disposition").to_pylist():
        if d:
            counters[d] = counters.get(d, 0) + 1
    if raw.num_rows == 0:
        if metrics_actor is not None:
            metrics_actor.incr.remote(counters)
        return FRONTIER_SCHEMA.empty_table()

    cands = proc(raw)
    reasons = cands.column("reject_reason").to_pylist()
    for r in reasons:
        if r:
            counters[r] = counters.get(r, 0) + 1
    import pyarrow.compute as pc

    cands = cands.filter(pc.equal(cands.column("reject_reason"), ""))
    if cands.num_rows == 0:
        if metrics_actor is not None:
            metrics_actor.incr.remote(counters)
        return FRONTIER_SCHEMA.empty_table()

    # distributed dedup: scatter to the seen shards, first-wins
    hashes = np.asarray(cands.column("url_hash").to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
    n_shards = len(seen_shards)
    shard_of = (hashes % np.uint64(n_shards)).astype(np.int64)
    mask = np.zeros(len(hashes), dtype=bool)
    refs, idxs = [], []
    for s in range(n_shards):
        idx = np.nonzero(shard_of == s)[0]
        if len(idx):
            refs.append(seen_shards[s].check_and_add.remote(hashes[idx]))
            idxs.append(idx)
    for idx, m in zip(idxs, ray.get(refs)):
        mask[idx] = m
    counters["queueadd"] = int(mask.sum())
    counters["queueduplicate"] = int((~mask).sum())
    if metrics_actor is not None:
        metrics_actor.incr.remote(counters)
    admitted = cands.filter(pa.array(mask))
    if admitted.num_rows == 0:
        return FRONTIER_SCHEMA.empty_table()

    seqs = (((round_no + 1) << 42)
            | (np.asarray(admitted.column("url_hash").to_numpy(zero_copy_only=False),
                          dtype=np.uint64) & np.uint64(_SEQ_MASK))).astype(np.int64)
    return candidates_to_frontier_rows(admitted, seqs.tolist(), round_no + 1)


@ray.remote(num_cpus=0)
class MetricsActor:
    """Per-stage metric counters (A8): incremented once per batch."""

    def __init__(self):
        self.counters: dict[str, int] = {}

    def incr(self, updates: dict) -> None:
        for k, v in updates.items():
            self.counters[k] = self.counters.get(k, 0) + int(v)

    def get(self) -> dict:
        return dict(self.counters)
