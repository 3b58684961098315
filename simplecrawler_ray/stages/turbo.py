"""Turbo round stage: the whole per-round pipeline fused into ONE
``map_batches`` UDF for the scale path.

Per input batch of queued frontier rows, inside the task:
  fetch -> parse/discover -> redirect re-queue -> canonicalize ->
  domain/robots/depth filters -> global dedup (RPC to the sharded
  seen-set actors) -> seq stamp
and the fetched rows (with payloads) are written DIRECTLY to the
parquet sink from the worker — they never travel to the driver.  The
task returns only the thin new-frontier rows (the next wave) plus one
in-band ``__meta`` JSON counter row per batch (no metrics actor, no
per-batch RPC — see A8 / crawler.ts event counters).

This trades the conformance mode's exact FIFO ordering for one dataset
execution per round and near-zero driver work:

* ``seq`` is hash-stamped: ``(round+1) << 42 | (url_hash & MASK)`` —
  monotone ACROSS rounds (BFS order preserved), arbitrary within a
  round.  Use the default engine mode when reference-exact ordering
  matters (tests); use turbo for throughput (bench / production).
* duplicate-candidate ties within a round are won by whichever task
  reaches the seen shard first (the reference's first-wins per
  arrival order — arrival order is just no longer deterministic).
* ``allow_initial_domain_change`` (crawler.ts:1951-1953 first-request
  redirect special case) IS applied: the batch holding the seed's
  redirect adopts the target host for its own candidate filtering and
  reports it via ``__meta`` (``__new_host``); the driver rewrites
  ``cfg.host`` and rebroadcasts before the next round.

Politeness still holds: the driver applies the per-host budget when
building the next wave from the returned rows.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..schemas import FRONTIER_SCHEMA
from .candidates import (CandidateProcessor, candidate_table,
                         candidates_to_frontier_rows, explode_discovered)
from .fetch import _WORKER_CACHE, _ref_key, Fetcher

_SEQ_MASK = (1 << 42) - 1
META_COL = "__meta"

_META_SCHEMA = pa.schema(list(FRONTIER_SCHEMA) + [pa.field(META_COL, pa.string())])


def _with_meta(frontier: pa.Table, counters: dict) -> pa.Table:
    """Attach the batch's counters as an in-band JSON column.

    Row 0 carries the JSON; other rows carry "".  A zero-row frontier
    still needs its counters delivered, so it becomes ONE all-null row
    with url == null — the driver strips such rows after aggregating
    (`split_meta`).
    """
    blob = json.dumps(counters, separators=(",", ":"))
    if frontier.num_rows == 0:
        cols = [pa.nulls(1, f.type) for f in FRONTIER_SCHEMA]
        return pa.table(cols + [pa.array([blob])], schema=_META_SCHEMA)
    meta = pa.array([blob] + [""] * (frontier.num_rows - 1), pa.string())
    return frontier.append_column(pa.field(META_COL, pa.string()), meta)


def merge_meta_blobs(counters: dict, blobs) -> None:
    """Merge META_COL JSON blobs into ``counters`` in place: int values
    accumulate, string values (e.g. the __new_host marker) overwrite —
    the ONE implementation of the in-band counter convention."""
    for blob in blobs:
        if blob:
            for k, v in json.loads(blob).items():
                if isinstance(v, str):
                    counters[k] = v
                else:
                    counters[k] = counters.get(k, 0) + int(v)


def split_meta(tables: list[pa.Table]) -> tuple[list[pa.Table], dict]:
    """Driver side: strip META_COL + null marker rows, merge counters."""
    counters: dict[str, int] = {}
    out = []
    for t in tables:
        merge_meta_blobs(counters, t.column(META_COL).to_pylist())
        t = t.drop_columns([META_COL])
        t = t.filter(pc.is_valid(t.column("url")))
        if t.num_rows:
            out.append(t)
    return out, counters


def turbo_round_udf(batch: pa.Table, *, web_ref, cfg_ref, robots_ref,
                    seen_shards, round_no, sink_dir,
                    first_request=False, first_seq=-1) -> pa.Table:
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

    counters = {"fetchstart": batch.num_rows}
    nonredir = 0
    for e in pc.value_counts(fetched.column("disposition")).to_pylist():
        d, c = e["values"], int(e["counts"])
        if d:
            counters[d] = counters.get(d, 0) + c
        if d != "fetchredirect":
            nonredir += c
    if nonredir:
        # first-request bookkeeping marker (stripped by the driver)
        counters["__nonredirect"] = nonredir

    raw = explode_discovered(fetched, cfg.get("max_depth", 0))

    # redirect targets re-queue (crawler.ts 3xx handling; parity with
    # _run_round crawl.py:465-487).  Depth is pinned: 1 for the seed's
    # first-request redirect, else referrer depth (override).
    redir_mask = pc.and_(pc.equal(fetched.column("disposition"), "fetchredirect"),
                         pc.not_equal(pc.coalesce(fetched.column("location"), ""), ""))
    redirs = fetched.filter(redir_mask)
    if redirs.num_rows:
        # first-request special-casing applies ONLY to the seed row
        # itself (seq == first_seq), not to every redirect in round 0 —
        # a multi-URL seeded frontier has thousands of round-0 rows and
        # treating each batch's min-seq redirect as "the first request"
        # mislabels depths and can rewrite cfg.host to an arbitrary
        # third-party host
        seqs = redirs.column("seq").to_pylist()
        if first_request and cfg.get("allow_initial_domain_change") \
                and first_seq in seqs:
            # first-request redirect host rewrite (crawler.ts:1951-1953):
            # adopt the target host for THIS batch's candidate filtering
            # and report it in-band so the driver rewrites cfg.host
            from ..urlnorm import process_url

            first_i = seqs.index(first_seq)
            tgt = process_url(redirs.column("location")[first_i].as_py(),
                              redirs.column("url")[first_i].as_py())
            if tgt is not None and tgt.host:
                counters["__new_host"] = tgt.host
                proc = CandidateProcessor({**cfg, "host": tgt.host},
                                          proc.robots)
        redir_cands = candidate_table([
            dict(candidate=loc, referrer_url=url, referrer_depth=dep,
                 parent_seq=seq, pos=0,
                 depth_override=(1 if first_request and seq == first_seq
                                 else -1))
            for loc, url, dep, seq in zip(
                redirs.column("location").to_pylist(),
                redirs.column("url").to_pylist(),
                redirs.column("depth").to_pylist(),
                seqs)
        ])
        raw = (pa.concat_tables([raw, redir_cands], promote_options="default")
               if raw.num_rows else redir_cands)

    if raw.num_rows == 0:
        return _with_meta(FRONTIER_SCHEMA.empty_table(), counters)

    cands = proc(raw)
    for e in pc.value_counts(cands.column("reject_reason")).to_pylist():
        if e["values"]:
            counters[e["values"]] = (counters.get(e["values"], 0)
                                     + int(e["counts"]))
    cands = cands.filter(pc.equal(cands.column("reject_reason"), ""))
    if cands.num_rows == 0:
        return _with_meta(FRONTIER_SCHEMA.empty_table(), counters)

    # distributed dedup: scatter to the seen shards, first-wins (the
    # ONE shard-routing implementation lives in state/seen.py)
    from ..state.seen import scatter_check_and_add

    hashes = np.asarray(cands.column("url_hash").to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
    mask = scatter_check_and_add(hashes, seen_shards)
    counters["queueadd"] = int(mask.sum())
    counters["queueduplicate"] = int((~mask).sum())
    admitted = cands.filter(pa.array(mask))
    if admitted.num_rows == 0:
        return _with_meta(FRONTIER_SCHEMA.empty_table(), counters)

    seqs = (((round_no + 1) << 42)
            | (np.asarray(admitted.column("url_hash").to_numpy(zero_copy_only=False),
                          dtype=np.uint64) & np.uint64(_SEQ_MASK))).astype(np.int64)
    rows = candidates_to_frontier_rows(admitted, seqs.tolist(), round_no + 1)
    return _with_meta(rows, counters)
