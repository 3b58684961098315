"""CrawlEngine: the BSP round loop over the frontier.

The reference's continuous event loop (``start()``/``crawl()`` tick,
src/crawler.ts:646-674, 1273-1360) becomes bulk-synchronous rounds
(SURVEY §2.9): each round dequeues a politeness-budgeted wave from the
queued frontier, fetches+parses it with a ``map_batches`` actor pool,
runs the candidate pipeline (canonicalize -> domain/robots/depth/
condition filters -> global dedup via sharded seen-set actors), stamps
``seq``, and unions the survivors into the frontier.  Under one host +
unlimited budget the wave order reproduces the reference's FIFO crawl
order (seq == QueueItem.id insertion order, src/queue.ts:113).

Scale design notes (100 TB / 10^10-URL target):
* fetch+parse co-located: bodies never cross stage boundaries;
* dedup state: hash-sharded actors (state/seen.py), NOT a driver set;
* frontier waves stream through Ray Data; the driver holds only
  queued-row tables (no payloads) and per-round object refs of fetched
  blocks — payloads live in the object store / parquet checkpoints;
* per-round checkpoint: parquet frontier + metrics/lineage JSON
  (replaces freeze/defrost, src/queue.ts:268-313), resumable.

Event callbacks (§2.10) are replaced by metric counters + a per-row
``disposition`` column; user fetch/download conditions are plain
callables evaluated inside the stages.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..robots import RobotsRules, host_key
from ..schemas import (
    FRONTIER_SCHEMA,
    STATUS_DISALLOWED,
    STATUS_QUEUED,
)
from ..stages.candidates import (
    CANDIDATE_SCHEMA,
    CandidateProcessor,
    candidate_table,
    candidate_udf,
    candidates_to_frontier_rows,
    explode_discovered,
)
from ..stages.fetch import fetcher_udf
from ..state.seen import SeenSet
from ..urlnorm import CanonOpts, process_url

PAYLOAD_COLS = ["body", "caption", "image_id", "disposition", "error_flags", "location",
                "discovered", "mime_supported"]

# canonical column order for stored fetched tables ("discovered" is
# transient — consumed by the candidate stage, not stored)
_FETCHED_ORDER = [f.name for f in FRONTIER_SCHEMA] + [
    "body", "caption", "image_id", "disposition", "error_flags", "location",
    "mime_supported", "phash"
]


def _normalize_fetched(t: pa.Table) -> pa.Table:
    cols = [c for c in _FETCHED_ORDER if c in t.column_names]
    return t.select(cols)


@ray.remote(num_returns=2)
def _split_fetched_block(t: pa.Table, want_body: bool):
    """Worker-side split of one fetched block: (normalized full block —
    stays in the object store; thin body-less view — the only part the
    driver pulls for round logic).  ``want_body`` keeps the payload in
    the thin view when a fetch_complete_hook needs it driver-side."""
    thin = t if want_body or "body" not in t.column_names else t.drop_columns(["body"])
    return _normalize_fetched(t), thin


@ray.remote
def _batched_hook_block(hook, t: pa.Table) -> "list[dict]":
    """Worker-side batched fetch-complete hook (§2.10 manual discovery
    at scale): the hook sees one block's downloaded rows as an Arrow
    table (seq order, payloads included) and returns candidates —
    either URL strings or dicts with ``candidate`` plus optional
    referrer attribution.  Unlike the per-row ``fetch_complete_hook``
    (which pulls every downloaded row to the driver), only the thin
    candidate list transits the driver (round-3 verdict #7)."""
    dl = t.filter(pc.equal(t.column("status"), "downloaded"))
    if dl.num_rows == 0:
        return []
    dl = dl.take(pc.sort_indices(dl, sort_keys=[("seq", "ascending")]))
    out = []
    for e in (hook(dl) or []):
        if isinstance(e, str):
            e = {"candidate": e}
        out.append(dict(candidate=e["candidate"],
                        referrer_url=e.get("referrer_url", ""),
                        referrer_depth=int(e.get("referrer_depth", 0)),
                        parent_seq=int(e.get("parent_seq", -1)),
                        pos=int(e.get("pos", 0))))
    return out


@ray.remote
def _write_block(t: pa.Table, path: str) -> int:
    """Worker-side checkpoint write of one fetched block (payloads never
    transit the driver; multi-node deployments point checkpoint_dir at
    shared storage, same contract as the turbo sink)."""
    pq.write_table(t, path)
    return t.num_rows


def _host_bucket(host: str, n_buckets: int) -> int:
    """Stable host -> bucket assignment shared by the driver store and
    worker-side adopt tasks (both must agree for the one-host-one-bucket
    invariant to hold)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b((host or "").encode(), digest_size=4).digest(),
        "little") % n_buckets


def _row_hook_adapter(hook):
    """Wrap a legacy single-row fetch_complete_hook (row dict ->
    list[str] of manual-discovery URLs) as a batched block hook so it
    runs WORKER-side via ``_batched_hook_block``: rows are visited in
    seq order within each block and only the candidate list reaches
    the driver — the per-row driver replay pulled every downloaded row
    (payload included) across the object store."""
    def batch_hook(dl: pa.Table) -> list:
        out = []
        for row in dl.to_pylist():      # dl arrives seq-sorted
            for u in (hook(row) or []):
                out.append(dict(candidate=u, referrer_url=row["url"],
                                referrer_depth=row["depth"],
                                parent_seq=row["seq"], pos=0))
        return out
    return batch_hook


def _robots_schemes(hklist: list, protocols: list) -> dict:
    """host:port -> scheme for the robots.txt fetch, deterministic when
    one host key appears with both http and https rows in a wave:
    https wins (a plain dict(zip(...)) was last-write-wins, so the
    robots fetch scheme depended on row order)."""
    schemes: dict = {}
    for hk, proto in zip(hklist, protocols):
        if hk not in schemes or proto == "https":
            schemes[hk] = proto
    return schemes


@ray.remote
def _adopt_frontier_block(block, n_buckets: int):
    """Worker-side adoption of one turbo-output block into the bucketed
    frontier store: strip the in-band ``__meta`` counters and partition
    the admitted rows by host bucket.  Streaming generator: the FIRST
    yield is ``(counters, [(bucket, n_rows, host_counts, seq_min,
    seq_max)])`` and each later yield is one bucket part table, in meta
    order.  Yielded values are task returns OWNED BY THE DRIVER — the
    previous worker-side ``ray.put`` left the part refs owned by a
    transient worker process, so an idle-worker reap or node loss
    silently dropped queued rows with OwnerDiedError (round-3 advice
    #1; ``ray.put`` objects are not lineage-reconstructable).  The
    driver still never sees the rows themselves — it ``ray.get``\\ s
    only the thin meta yield."""
    from ..stages.turbo import META_COL, merge_meta_blobs

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    counters: dict[str, int] = {}
    if META_COL in block.column_names:
        merge_meta_blobs(counters, block.column(META_COL).to_pylist())
        block = block.drop_columns([META_COL])
        block = block.filter(pc.is_valid(block.column("url")))
    meta, tables = [], []
    if block.num_rows:
        hosts = block.column("host").to_pylist()
        cache: dict[str, int] = {}
        assign = np.fromiter(
            (cache.get(h) if h in cache
             else cache.setdefault(h, _host_bucket(h, n_buckets))
             for h in hosts), dtype=np.int32, count=len(hosts))
        for b in np.unique(assign):
            part = block.filter(pa.array(assign == b))
            hc = {e["values"]: e["counts"]
                  for e in pc.value_counts(part.column("host")).to_pylist()}
            seqs = part.column("seq")
            meta.append((int(b), part.num_rows, hc,
                         pc.min(seqs).as_py(), pc.max(seqs).as_py()))
            tables.append(part)
    yield counters, meta
    for t in tables:
        yield t


def _patch_row(t: pa.Table, idx: int, flat: dict) -> tuple[pa.Table, dict]:
    """Rewrite one row of an Arrow table: zero-copy slices around a
    patched single-row table (no ``to_pylist`` of whole columns —
    round-3 verdict #4)."""
    row_t = t.slice(idx, 1)
    for col, val in flat.items():
        fi = row_t.schema.get_field_index(col)
        row_t = row_t.set_column(
            fi, col, pa.array([val], t.schema.field(col).type))
    out = pa.concat_tables([t.slice(0, idx), row_t, t.slice(idx + 1)])
    # each patch adds ~2 chunk boundaries; bound the fragmentation so
    # N successive updates stay O(1) chunks amortized instead of O(N)
    if out.column(0).num_chunks > 16:
        out = out.combine_chunks()
    row = {c: row_t.column(c)[0].as_py() for c in row_t.column_names}
    return out, row


@ray.remote(num_returns=3)
def _update_frontier_block(block, seq: int, flat: dict):
    """Worker-side point update (J3 / src/queue.ts:157-174) of one
    frontier block: if the block holds ``seq``, rewrite the row and
    return (True, new_block, row_dict); else (False, None, None).  The
    driver swaps the block ref — rows never transit the driver."""
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    idx = pc.index(block.column("seq"), pa.scalar(seq)).as_py()
    if idx is None or idx < 0:
        return False, None, None
    t, row = _patch_row(block, idx, flat)
    return True, t, row


@ray.remote(num_returns=4)
def _bucket_dequeue(refs: list, budget: int):
    """Worker-side politeness dequeue of ONE host bucket: all of a
    host's rows live in exactly one bucket (rows were hash-partitioned
    by host on add), so the per-host oldest-``budget`` cut needs NO
    cross-bucket shuffle — the round-1 salted groupby's whole-frontier
    exchange becomes B independent tasks.  Returns (wave, remainder,
    remainder_rows, remainder_seq_range); the driver keeps the
    remainder as a ref and never pulls it."""
    tables = [t for t in ray.get(list(refs)) if t.num_rows]
    if not tables:
        empty = FRONTIER_SCHEMA.empty_table()
        return empty, empty, 0, (0, 0)
    t = pa.concat_tables(tables, promote_options="default")
    t = t.take(pc.sort_indices(t, sort_keys=[("seq", "ascending")]))
    import pandas as _pd

    rank = t.select(["host"]).to_pandas().groupby("host").cumcount()
    take = pa.array((rank < budget).to_numpy())
    wave = t.filter(take)
    rem = t.filter(pc.invert(take))
    rng = ((pc.min(rem.column("seq")).as_py(), pc.max(rem.column("seq")).as_py())
           if rem.num_rows else (0, 0))
    return wave, rem, rem.num_rows, rng


class _DatasetFrontier:
    """Object-store-resident queued frontier (``frontier_backend="dataset"``).

    The driver holds only block ObjectRefs (hash-partitioned by host
    into ``n_buckets`` ref lists) + per-block row counts + a per-host
    row Counter; the queued rows themselves live in — and spill from —
    the Ray object store.  Budget dequeues run one `_bucket_dequeue`
    task per bucket (a host's rows never leave their bucket, so no
    global shuffle); budget-0 dequeues use the two-pass global-oldest
    cutoff.  The salted `politeness_dequeue_ds` groupby operator
    remains the fallback for externally-supplied (un-bucketed)
    frontiers."""

    #: per-block seq range when unknown (adopted foreign blocks): every
    #: point-update probe must consider the block
    SEQ_RANGE_UNKNOWN = (-(1 << 62), 1 << 62)

    def __init__(self, n_buckets: int = 16):
        self.n_buckets = n_buckets
        self.buckets: list[list] = [[] for _ in range(n_buckets)]
        self.bucket_rows: list[list[int]] = [[] for _ in range(n_buckets)]
        # (min_seq, max_seq) per block, parallel to buckets/bucket_rows:
        # point updates probe only the covering block(s), not every block
        # (round-3 verdict #4)
        self.bucket_seq: list[list[tuple[int, int]]] = [[] for _ in range(n_buckets)]
        self.host_counts: dict[str, int] = {}
        self._host_bucket_cache: dict[str, int] = {}
        # flat = bucket identity unknown (blocks adopted via set_blocks):
        # budget dequeues must use the salted groupby fallback
        self.flat = False

    @property
    def refs(self) -> list:
        return [r for b in self.buckets for r in b]

    @property
    def block_counts(self) -> list:
        return [n for b in self.bucket_rows for n in b]

    @property
    def num_rows(self) -> int:
        return sum(n for b in self.bucket_rows for n in b)

    def _bucket_of(self, host: str) -> int:
        b = self._host_bucket_cache.get(host)
        if b is None:
            b = _host_bucket(host, self.n_buckets)
            if len(self._host_bucket_cache) > 1_000_000:
                self._host_bucket_cache.clear()
            self._host_bucket_cache[host] = b
        return b

    def adopt_parts(self, parts: list) -> None:
        """Adopt worker-bucketed frontier parts: ``(bucket, ref, n_rows,
        host_counts, seq_min, seq_max)`` tuples assembled from
        ``_adopt_frontier_block``'s yields — the rows stay in the object
        store; the driver records refs + counts + seq ranges only
        (the turbo-path ingestion; `add_table` remains for driver-side
        row sources: seeds, manual enqueues, checkpoint load)."""
        dest = 0 if self.flat else None  # flat store: bucket identity moot
        for b, ref, n, hc, smin, smax in parts:
            tb = dest if dest is not None else b
            self.buckets[tb].append(ref)
            self.bucket_rows[tb].append(n)
            self.bucket_seq[tb].append((smin, smax))
            for h, c in hc.items():
                self.host_counts[h] = self.host_counts.get(h, 0) + c

    def add_table(self, t: pa.Table) -> None:
        if t.num_rows == 0:
            return

        def _rng(part: pa.Table) -> tuple[int, int]:
            s = part.column("seq")
            return (pc.min(s).as_py(), pc.max(s).as_py())

        if self.flat:
            # bucket invariant already lost: keep everything in one pool
            self.buckets[0].append(ray.put(t))
            self.bucket_rows[0].append(t.num_rows)
            self.bucket_seq[0].append(_rng(t))
        else:
            hosts = t.column("host").to_pylist()
            assign = np.fromiter((self._bucket_of(h) for h in hosts),
                                 dtype=np.int32, count=len(hosts))
            for b in np.unique(assign):
                part = t.filter(pa.array(assign == b))
                self.buckets[int(b)].append(ray.put(part))
                self.bucket_rows[int(b)].append(part.num_rows)
                self.bucket_seq[int(b)].append(_rng(part))
        for e in pc.value_counts(t.column("host")).to_pylist():
            self.host_counts[e["values"]] = (
                self.host_counts.get(e["values"], 0) + e["counts"])

    def dequeue_budget(self, budget: int) -> pa.Table:
        """Per-bucket worker-side politeness cut; remainder refs kept,
        never gathered.  Returns the seq-sorted wave."""
        futures = []
        for b in range(self.n_buckets):
            if self.bucket_rows[b]:
                futures.append((b, _bucket_dequeue.remote(self.buckets[b], budget)))
        wave_parts = []
        for b, (wave_ref, rem_ref, nrem_ref, rng_ref) in futures:
            nrem = ray.get(nrem_ref)
            self.buckets[b] = [rem_ref] if nrem else []
            self.bucket_rows[b] = [nrem] if nrem else []
            self.bucket_seq[b] = [tuple(ray.get(rng_ref))] if nrem else []
            wave_parts.append(ray.get(wave_ref))
        wave_parts = [w for w in wave_parts if w.num_rows]
        self.maybe_unflatten()
        if not wave_parts:
            return FRONTIER_SCHEMA.empty_table()
        wave = pa.concat_tables(wave_parts, promote_options="default")
        return wave.take(pc.sort_indices(wave, sort_keys=[("seq", "ascending")]))

    def maybe_unflatten(self) -> None:
        """Once a flat store fully drains, bucket identity can be
        rebuilt: new ``add_table`` rows re-bucket by host and budget
        dequeues return to the per-bucket fast path (without this the
        one-time ``set_blocks`` fallback was permanent)."""
        if self.flat and self.num_rows == 0:
            self.flat = False
            self.buckets = [[] for _ in range(self.n_buckets)]
            self.bucket_rows = [[] for _ in range(self.n_buckets)]
            self.bucket_seq = [[] for _ in range(self.n_buckets)]

    def subtract_hosts(self, t: pa.Table) -> None:
        for e in pc.value_counts(t.column("host")).to_pylist():
            n = self.host_counts.get(e["values"], 0) - e["counts"]
            if n > 0:
                self.host_counts[e["values"]] = n
            else:
                self.host_counts.pop(e["values"], None)

    def set_blocks(self, materialized: "rd.MaterializedDataset") -> None:
        """Repoint the store at a materialized dataset's blocks (Arrow
        blocks; counts from block metadata — no data pull).  Bucket
        identity is lost — the store goes FLAT (everything in bucket 0)
        and budget dequeues fall back to the salted groupby operator
        until the store is rebuilt by per-bucket dequeues."""
        self.flat = True
        self.buckets = [[] for _ in range(self.n_buckets)]
        self.bucket_rows = [[] for _ in range(self.n_buckets)]
        self.bucket_seq = [[] for _ in range(self.n_buckets)]
        for b in materialized.iter_internal_ref_bundles():
            for ref, meta in b.blocks:
                n = meta.num_rows or 0
                if n:
                    self.buckets[0].append(ref)
                    self.bucket_rows[0].append(n)
                    self.bucket_seq[0].append(self.SEQ_RANGE_UNKNOWN)
        self.maybe_unflatten()  # an empty repoint restores bucketing

    def dataset(self) -> rd.Dataset:
        return rd.from_arrow_refs(list(self.refs))

    def hot_hosts(self, salt_threshold: int, max_salt: int) -> dict[str, int]:
        return {h: min(max_salt, -(-n // salt_threshold))
                for h, n in self.host_counts.items() if n > salt_threshold}

    def gather(self) -> pa.Table:
        """Driver materialization — inspection/small frontiers only."""
        if not self.refs:
            return FRONTIER_SCHEMA.empty_table()
        return pa.concat_tables(
            [t for t in ray.get(list(self.refs)) if t.num_rows],
            promote_options="default")

DEFAULT_CONFIG = dict(
    max_depth=0,
    interval_ms=250,
    max_concurrency=5,
    host_budget_per_round=0,   # 0 = whole wave (conformance); >0 = politeness cap
    max_wave_rows=0,           # 0 = unlimited; >0 caps rows per round so
                               # per-round memory is bounded for huge frontiers
    respect_robots_txt=True,
    allow_initial_domain_change=False,
    filter_by_domain=True,
    ignore_www_domain=True,
    scan_subdomains=False,
    domain_whitelist=None,
    strip_querystring=False,
    sort_query_parameters=False,
    strip_www_domain=False,
    url_encoding="unicode",
    parse_html_comments=True,
    parse_script_tags=True,
    download_unsupported=True,
    max_resource_size=16 * 1024 * 1024,
    supported_mime_types=None,
    accept_cookies=True,
    discover=True,
    store_body=True,
    fetch_conditions=None,
    download_conditions=None,
    seen_backend="exact",
    seen_shards=4,
    seen_capacity_per_shard=1 << 20,
    batch_size=256,
    fetcher_concurrency=4,
    fetch_threads=0,        # >1: threaded batch I/O for real transports
                            # (HttpWeb); latency-bound WAN fetches need it
    driver_side_hook=False,  # True: legacy per-row fetch_complete_hook
                             # replay on the driver (hooks that mutate
                             # driver state / need cross-block order);
                             # False: single-row hooks run worker-side
                             # through the batched block hook
    checkpoint_dir=None,
    checkpoint_seen=False,  # snapshot seen-shard filters per checkpoint
                            # (one .npz per shard) -> resume is O(filter
                            # bytes), not O(crawled URLs) hash replay
    phash_fetched=False,
    user_agent="simplecrawler-ray/1.0",
    decompress_responses=True,
    needs_auth=False,
    auth_user=None,
    auth_pass=None,
    custom_headers=None,
    track_fetch_order=True,  # keep the per-URL fetch log (conformance /
                             # FIFO assertions).  Disable for large crawls:
                             # the list grows O(fetched) on the driver.
    robots_pool_shards=0,   # >0: sharded RobotsShard actors fetch robots.txt
    robots_cache_max_hosts=100_000,  # driver-side rules cache bound: past
                            # this, the sharded pool auto-enables and the
                            # oldest driver entries are evicted (shards keep
                            # the rules; re-ensure is one RPC, no refetch)
    robots_pool_auto_shards=8,  # pool size used by the auto-enable
    frontier_backend="driver",  # "driver": Arrow table on the driver (exact,
                               # sandbox default); "dataset": queued rows live
                               # in the object store, dequeue is the salted
                               # Dataset politeness operator — the 10^10 path
    salt_threshold=10_000,     # queued rows per host before salting kicks in
    max_salt=16,               # max sub-buckets per hot host
    # reference API-parity knobs; inert against the synthetic transport
    # (no real sockets to time out / proxy), accepted so a reference
    # user's config ports unchanged (README.md Configuration section)
    timeout=300000,          # per-request header timeout (ms)
    listener_ttl=10000,      # async-listener TTL (ms)
    decode_responses=False,  # body stays raw bytes; `caption` is decoded
    use_proxy=False,
    proxy_hostname="127.0.0.1",
    proxy_port=8123,
    proxy_user=None,
    proxy_pass=None,
)


class CrawlEngine:
    def __init__(self, web, initial_url: str, cache_index: Optional[dict] = None,
                 fetch_complete_hook: Optional[Callable[[dict], "list[str]|None"]] = None,
                 fetch_complete_batch_hook: Optional[
                     Callable[[pa.Table], "list|None"]] = None,
                 **options):
        # cache (conditional-GET) support only when the caller attaches an
        # index — mirrors the reference's `cache = null` default
        unknown = set(options) - set(DEFAULT_CONFIG)
        if unknown:
            raise TypeError(f"unknown options: {unknown}")
        self.cfg = {**DEFAULT_CONFIG, **options}
        self.web = web
        self.initial_url = initial_url
        seed = process_url(initial_url)
        if seed is None or not seed.host:
            raise ValueError(f"cannot parse initial URL {initial_url!r}")
        self.cfg["host"] = seed.host
        self.seed_row = seed
        self.use_cache = cache_index is not None
        self.cache_index = cache_index if cache_index is not None else {}
        # batched form: hook(downloaded_block: pa.Table) -> candidates,
        # evaluated WORKER-side per fetched block — the scale path (the
        # per-row hook pulls every downloaded row to the driver).
        # A single-row hook is routed THROUGH the batched form by
        # default (worker-side, seq order preserved within a block);
        # hooks that mutate driver state opt out with
        # driver_side_hook=True, keeping the legacy per-row replay.
        self.fetch_complete_hook = None
        self.fetch_complete_batch_hook = fetch_complete_batch_hook
        if fetch_complete_hook is not None:
            if self.cfg["driver_side_hook"]:
                self.fetch_complete_hook = fetch_complete_hook
            else:
                if fetch_complete_batch_hook is not None:
                    raise TypeError("pass either fetch_complete_hook or "
                                    "fetch_complete_batch_hook, not both")
                import warnings
                warnings.warn(
                    "fetch_complete_hook runs WORKER-side by default: the "
                    "hook is serialized per round, so mutations of driver-"
                    "local state (e.g. appending to a list the hook closes "
                    "over) will NOT be visible on the driver, and hooks "
                    "closing over unpicklable objects fail at serialization."
                    "  Pass driver_side_hook=True for the legacy in-process "
                    "per-row replay (conformance-scale only).",
                    stacklevel=3)
                self.fetch_complete_batch_hook = _row_hook_adapter(
                    fetch_complete_hook)
        self._batch_hook_ref = None

        self.seen = SeenSet(
            num_shards=self.cfg["seen_shards"],
            backend=self.cfg["seen_backend"],
            capacity_per_shard=self.cfg["seen_capacity_per_shard"],
        )
        self.robots_cache: dict[str, RobotsRules] = {}
        self.robots_errors: list[str] = []
        self._robots_pool = None
        self.metrics: dict[str, int] = {}
        self.fetch_order: list[str] = []
        self.next_seq = 0
        self.round_no = 0
        self.first_request = True
        self.queued: pa.Table = FRONTIER_SCHEMA.empty_table()
        self._frontier = (_DatasetFrontier()
                          if self.cfg["frontier_backend"] == "dataset" else None)
        self.terminal_refs: list = []      # ObjectRefs of fetched arrow tables
        self._manual: list[dict] = []      # manually enqueued candidates
        self._wait_handles: list[dict] = []  # open wait() completion holds
        self._cond_seq = 0                 # add/removeFetchCondition ids
        self._cond_ids: dict[int, tuple] = {}
        self._web_ref = None
        self.timings: dict[str, float] = {}  # per-phase seconds (profiling)

    # ------------------------------------------------------------- helpers

    def _timed(self, key: str):
        import contextlib, time as _t

        @contextlib.contextmanager
        def cm():
            t0 = _t.perf_counter()
            yield
            self.timings[key] = self.timings.get(key, 0.0) + _t.perf_counter() - t0
        return cm()

    def _count(self, key: str, n: int = 1) -> None:
        if n:
            self.metrics[key] = self.metrics.get(key, 0) + n

    def enqueue(self, url: str, referrer_url: str = "", referrer_depth: int = 0,
                force: bool = False) -> None:
        """Manual queueURL (src/crawler.ts:1483-1538): processed through the
        same canonicalize/filter/dedup pipeline next round."""
        self._manual.append(dict(candidate=url, referrer_url=referrer_url,
                                 referrer_depth=referrer_depth, forced=force))

    def add_fetch_condition(self, cond) -> int:
        """addFetchCondition parity (src/crawler.ts:1502-1511): register
        a predicate (sync / async / callback form, see conditions.py)
        and return its removal id.  Takes effect from the next round
        (conditions snapshot per round via cfg broadcast)."""
        self._cond_seq += 1
        self.cfg["fetch_conditions"] = ((self.cfg.get("fetch_conditions") or [])
                                        + [cond])
        self._cond_ids[self._cond_seq] = ("fetch_conditions", cond)
        return self._cond_seq

    def add_download_condition(self, cond) -> int:
        """addDownloadCondition parity (src/crawler.ts:1180-1192)."""
        self._cond_seq += 1
        self.cfg["download_conditions"] = ((self.cfg.get("download_conditions")
                                            or []) + [cond])
        self._cond_ids[self._cond_seq] = ("download_conditions", cond)
        return self._cond_seq

    def remove_fetch_condition(self, cond_id: int) -> None:
        """removeFetchCondition parity (src/crawler.ts:1513-1523):
        unknown ids raise."""
        self._remove_condition(cond_id, "fetch_conditions")

    def remove_download_condition(self, cond_id: int) -> None:
        self._remove_condition(cond_id, "download_conditions")

    def _remove_condition(self, cond_id: int, kind: str) -> None:
        entry = self._cond_ids.get(cond_id)
        if entry is None or entry[0] != kind:
            raise ValueError(
                f"Unable to find a {kind[:-1]} with id {cond_id}")
        del self._cond_ids[cond_id]
        self.cfg[kind] = [c for c in self.cfg[kind] if c is not entry[1]]

    def update_queued(self, seq: int, updates: dict) -> dict:
        """FetchQueue.update parity (src/queue.ts:157-174): deep-assign
        nested updates into a queued row by seq between rounds.

        Driver backend: in-place table patch.  Dataset backend: the
        block holding ``seq`` is rewritten WORKER-side
        (`_update_frontier_block`) and its ref swapped — rows stay in
        the object store."""
        if self._frontier is not None:
            return self._update_queued_ds(seq, updates)
        from ..queue_api import FrontierQueue

        idx = pc.index(self.queued.column("seq"), pa.scalar(seq)).as_py()
        if idx < 0:
            raise KeyError(f"no queued row with seq {seq}")
        q = FrontierQueue(self.queued)
        row = q.update(idx, updates)
        self.queued = q._data
        return row

    def _update_queued_ds(self, seq: int, updates: dict) -> dict:
        from ..queue_api import _flatten_comparator

        flat = _flatten_comparator(updates)
        schema_cols = {f.name for f in FRONTIER_SCHEMA}
        for col in flat:
            if col not in schema_cols:
                raise KeyError(f"unknown column {col!r}")
        if "host" in flat or "seq" in flat:
            # host is the bucketing key and seq the identity — a rewrite
            # would silently break the store's invariants
            raise ValueError(
                "updating 'host' or 'seq' is not supported on the dataset "
                "frontier backend (bucket/identity invariants)")
        fr = self._frontier
        pending = []  # (bucket, block_idx, found_ref, new_ref, row_ref)
        for b in range(fr.n_buckets):
            for i, ref in enumerate(fr.buckets[b]):
                # per-block seq-range metadata: probe ONLY covering
                # blocks (round-3 verdict #4 — previously one rewrite
                # task launched against EVERY block)
                smin, smax = fr.bucket_seq[b][i]
                if not (smin <= seq <= smax):
                    continue
                f, n, r = _update_frontier_block.remote(ref, seq, flat)
                pending.append((b, i, f, n, r))
        self._last_update_probes = len(pending)  # test/diagnostic hook
        for b, i, f, n, r in pending:
            if ray.get(f):
                fr.buckets[b][i] = n
                return ray.get(r)
        raise KeyError(f"no queued row with seq {seq}")

    def wait(self) -> Callable[[], None]:
        """Async-listener completion barrier (T6, crawler.ts:1140-1160):
        returns a ``done()`` handle.  ``run()`` will not declare the
        crawl complete while a handle is open; a handle older than
        ``listener_ttl`` ms is force-expired (reference TTL semantics).
        Listeners typically ``enqueue(...)`` from another thread, then
        call ``done()``."""
        import time as _t

        h = {"t0": _t.monotonic(), "done": False}
        self._wait_handles.append(h)

        def done() -> None:
            h["done"] = True

        return done

    def _drain_waits(self) -> bool:
        """Poll open wait() handles until all are done/expired or a
        manual enqueue arrives.  Returns True if new work appeared."""
        import time as _t

        ttl_s = self.cfg["listener_ttl"] / 1000.0
        while True:
            self._wait_handles = [
                h for h in self._wait_handles
                if not h["done"] and (_t.monotonic() - h["t0"]) < ttl_s
            ]
            if self._manual:
                return True
            if not self._wait_handles:
                return False
            _t.sleep(0.005)

    _SEED_DISTRIBUTE_THRESHOLD = 100_000

    def seed_frontier(self, urls: list[str]) -> int:
        """Bulk-enqueue a synthetic frontier (FIXTURES §7) through the
        standard canonicalize/filter/dedup pipeline.  Returns admitted
        count.  Setup step — benchmarks time the crawl, not this.

        Above ``_SEED_DISTRIBUTE_THRESHOLD`` URLs the canonicalization
        (the per-row Python work) fans out as ``candidate_udf`` tasks —
        a 10M-URL seed dropped from ~450 s (sequential driver loop) to
        the parallel path; admit (vectorized arrow + sharded seen
        scatter) stays driver-side either way."""
        cands = candidate_table([
            dict(candidate=u, referrer_url="", referrer_depth=0,
                 parent_seq=-2, pos=i)
            for i, u in enumerate(urls)
        ])
        if cands.num_rows > self._SEED_DISTRIBUTE_THRESHOLD:
            from ..ops import gather_tables
            from ..stages.candidates import candidate_udf

            cfg_ref = ray.put(self.cfg)
            robots_ref = ray.put(self.robots_cache)
            bs = 65536
            chunks = [cands.slice(o, bs)
                      for o in range(0, cands.num_rows, bs)]
            processed = gather_tables(
                rd.from_arrow(chunks).map_batches(
                    candidate_udf,
                    fn_kwargs=dict(cfg_ref=cfg_ref, robots_ref=robots_ref),
                    batch_format="pyarrow", batch_size=bs,
                    zero_copy_batch=True))
            out = (pa.concat_tables(processed, promote_options="default")
                   if processed else candidate_table([]))
            admitted = self._admit_candidates(out)
        else:
            proc = CandidateProcessor(self.cfg, self.robots_cache)
            admitted = self._admit_candidates(proc(cands))
        return admitted.num_rows

    def _cfg_broadcast(self):
        """Re-``ray.put`` self.cfg ONLY when it changed: the worker-side
        UDF cache keys on the ref hex, so a fresh ref every round would
        rebuild each worker's Fetcher (re-deserializing the whole web/
        corpus object) once per round instead of once per crawl."""
        snap = dict(self.cfg)
        if getattr(self, "_cfg_ref", None) is None or snap != self._cfg_snap:
            self._cfg_ref = ray.put(self.cfg)
            self._cfg_snap = snap
        return self._cfg_ref

    def _cache_broadcast(self):
        """Same change-detection for the 304 cache index."""
        snap = dict(self.cache_index)
        if (getattr(self, "_cache_ref", None) is None
                or snap != self._cache_snap):
            self._cache_ref = ray.put(snap)
            self._cache_snap = snap
        return self._cache_ref

    def _robots_broadcast(self):
        """Same change-detection for the robots rules snapshot (values
        compare by identity — _fetch_robots adds/evicts entries, never
        mutates a rules object in place)."""
        snap = dict(self.robots_cache)
        if (getattr(self, "_robots_ref", None) is None
                or snap != self._robots_snap):
            self._robots_ref = ray.put(self.robots_cache)
            self._robots_snap = snap
        return self._robots_ref

    def _seed(self) -> None:
        # start() adds the seed directly — no domain/robots/condition gate
        # (src/crawler.ts:646-674)
        cands = candidate_table([dict(candidate=self.initial_url, referrer_url="",
                                      referrer_depth=0, parent_seq=-2, pos=0)])
        proc = CandidateProcessor(
            {**self.cfg, "fetch_conditions": None, "filter_by_domain": False,
             "respect_robots_txt": False}, {})
        admitted = self._admit_candidates(proc(cands))
        if admitted.num_rows and not hasattr(self, "_seed_seq"):
            # the seed's seq scopes first-request special-casing in the
            # turbo UDF (only THIS row is "the first request")
            self._seed_seq = int(admitted.column("seq")[0].as_py())

    def _admit_candidates(self, cands: pa.Table) -> pa.Table:
        """Filter counters -> dedup (first-wins in (parent_seq,pos) order)
        -> seq-stamp -> append queued rows.  Returns admitted rows."""
        if cands.num_rows == 0:
            return FRONTIER_SCHEMA.empty_table()
        # deterministic FIFO order
        order = pc.sort_indices(
            cands, sort_keys=[("parent_seq", "ascending"), ("pos", "ascending")]
        )
        cands = cands.take(order)
        reasons = cands.column("reject_reason").to_pylist()
        for r in reasons:
            if r:
                self._count(r)
        keep = pc.equal(cands.column("reject_reason"), "")
        cands = cands.filter(keep)
        if cands.num_rows == 0:
            return FRONTIER_SCHEMA.empty_table()
        hashes = np.asarray(cands.column("url_hash").to_numpy(zero_copy_only=False), dtype=np.uint64)
        forced = np.asarray(cands.column("forced").to_numpy(zero_copy_only=False), dtype=bool)
        # large batches (bulk seeds) fan the dedup scatter out as worker
        # tasks — same first-wins semantics, no driver RPC funnel
        # (round-3 verdict #2); small waves stay on the low-latency
        # driver scatter
        if cands.num_rows > SeenSet.DISTRIBUTED_CHUNK:
            new_mask = self.seen.check_and_add_distributed(hashes)
        else:
            new_mask = self.seen.check_and_add(hashes)
        admit = new_mask | forced
        dup_count = int((~new_mask & ~forced).sum())
        self._count("queueduplicate", dup_count)
        admitted = cands.filter(pa.array(admit))
        n = admitted.num_rows
        if n == 0:
            return FRONTIER_SCHEMA.empty_table()
        seqs = list(range(self.next_seq, self.next_seq + n))
        self.next_seq += n
        self._count("queueadd", n)
        rows = candidates_to_frontier_rows(admitted, seqs, self.round_no)
        self._queue_add(rows)
        return rows

    def _queue_add(self, rows: pa.Table) -> None:
        if rows.num_rows == 0:
            return
        if self._frontier is not None:
            self._frontier.add_table(rows)
        else:
            self.queued = (pa.concat_tables([self.queued, rows])
                           if self.queued.num_rows else rows)

    def _queue_num_rows(self) -> int:
        return (self._frontier.num_rows if self._frontier is not None
                else self.queued.num_rows)

    def queued_table(self) -> pa.Table:
        """Driver view of the queued frontier (inspection / small scale;
        the dataset backend gathers its blocks here)."""
        return (self._frontier.gather() if self._frontier is not None
                else self.queued)

    def _fetch_robots(self, hosts: set[str],
                      schemes: "dict[str, str] | None" = None) -> pa.Table | None:
        """Fetch+parse robots.txt for new hosts.  Driver-side by default
        (one tiny GET per host per crawl; hosts << URLs); with
        ``robots_pool_shards`` > 0 the fetching itself is distributed
        across RobotsShard actors (state/robots_pool.py, T2 scale path).
        Returns sitemap candidates."""
        cap = self.cfg["robots_cache_max_hosts"]
        if (not self.cfg["robots_pool_shards"] and cap
                and len(self.robots_cache) > cap):
            # scale guard: past the cap the driver must not keep fetching
            # and holding every host's rules — switch to the sharded pool
            # (round-2 verdict #10)
            self.cfg["robots_pool_shards"] = self.cfg["robots_pool_auto_shards"]
        if self.cfg["robots_pool_shards"]:
            from ..state.robots_pool import RobotsPool

            if self._robots_pool is None:
                if self._web_ref is None:
                    self._web_ref = ray.put(self.web)
                self._robots_pool = RobotsPool(
                    self._web_ref, self.cfg["robots_pool_shards"],
                    self.cfg.get("user_agent", "*"))
            new_hosts = [hk for hk in sorted(hosts) if hk not in self.robots_cache]
            if not new_hosts:
                return None
            self.robots_cache.update(
                self._robots_pool.ensure(new_hosts, schemes))
            cap = self.cfg["robots_cache_max_hosts"]
            if cap and len(self.robots_cache) > cap:
                # bound driver memory: evict oldest entries not needed by
                # this wave — the shards still hold them, so a future wave
                # re-ensures with one RPC instead of a refetch
                excess = len(self.robots_cache) - cap
                for hk in [k for k in self.robots_cache
                           if k not in hosts][:excess]:
                    del self.robots_cache[hk]
            for err in self._robots_pool.drain_errors():
                self.robots_errors.append(err)
                self._count("robotstxterror")
            sitemap_cands = [
                dict(candidate=sm, referrer_url=rurl, referrer_depth=0,
                     parent_seq=-1, pos=0)
                for rurl, sm in self._robots_pool.drain_sitemaps()
            ]
            return candidate_table(sitemap_cands) if sitemap_cands else None
        # driver-side small-scale path: same shared fetch implementation
        # as the sharded pool (state/robots_pool._fetch_and_parse), so
        # redirect/scheme/parse behavior cannot drift between the two
        from ..state.robots_pool import _fetch_and_parse

        sitemap_cands = []
        ua = self.cfg.get("user_agent", "*")
        for hk in sorted(hosts):
            if hk in self.robots_cache:
                continue
            rules, sitemaps, err = _fetch_and_parse(
                self.web, hk, ua, scheme=(schemes or {}).get(hk))
            if err:
                self.robots_errors.append(err)
                self._count("robotstxterror")
            self.robots_cache[hk] = rules
            for sm in sitemaps:
                sitemap_cands.append(dict(candidate=sm, referrer_url=rules.url,
                                          referrer_depth=0, parent_seq=-1, pos=0))
        return candidate_table(sitemap_cands) if sitemap_cands else None

    def _dequeue_wave(self) -> pa.Table:
        """Politeness dequeue (O1): per-host budget of the oldest queued
        rows by seq; budget 0 => whole frontier wave.

        Driver-side vectorized implementation by default (frontier fits
        one node in this sandbox); with ``frontier_backend="dataset"``
        the same operator runs over the object-store-resident frontier
        with host-bucket salting and the driver only ever holds the
        wave (the multi-node 10^10 path).
        """
        if self._frontier is not None:
            return self._dequeue_wave_ds()
        q = self.queued
        budget = self.cfg["host_budget_per_round"]
        if q.num_rows == 0:
            return q
        order = pc.sort_indices(q, sort_keys=[("seq", "ascending")])
        q = q.take(order)
        if not budget:
            self.queued = FRONTIER_SCHEMA.empty_table()
            return self._cap_wave(q)
        df = q.select(["host"]).to_pandas()
        rank = df.groupby("host").cumcount()
        take = pa.array((rank < budget).to_numpy())
        wave = q.filter(take)
        self.queued = q.filter(pc.invert(take))
        return self._cap_wave(wave)

    def _cap_wave(self, wave: pa.Table) -> pa.Table:
        cap = self.cfg["max_wave_rows"]
        if cap and wave.num_rows > cap:
            overflow = wave.slice(cap)
            if self._frontier is not None:
                self._frontier.add_table(overflow)
            else:
                self.queued = (pa.concat_tables([overflow, self.queued])
                               if self.queued.num_rows else overflow)
            return wave.slice(0, cap)
        return wave

    def _dequeue_wave_ds(self) -> pa.Table:
        """Dataset-backend dequeue: salted politeness (budget > 0) or
        global-oldest-W (budget 0 + max_wave_rows); the remainder is
        re-pinned as block refs, never gathered."""
        from ..stages.politeness import dequeue_oldest_ds, politeness_dequeue_ds

        fr = self._frontier
        if fr.num_rows == 0:
            return FRONTIER_SCHEMA.empty_table()
        ds = fr.dataset()
        budget = self.cfg["host_budget_per_round"]
        cap = self.cfg["max_wave_rows"]
        if budget:
            if not fr.flat:
                # bucketed fast path: per-bucket worker-side cut, no
                # frontier-wide shuffle (a host's rows live in exactly
                # one bucket)
                wave = fr.dequeue_budget(budget)
                fr.subtract_hosts(wave)
                if cap and wave.num_rows > cap:
                    fr.add_table(wave.slice(cap))  # same host buckets
                    wave = wave.slice(0, cap)
            else:
                # flat store (adopted blocks): salted groupby operator
                hot = fr.hot_hosts(self.cfg["salt_threshold"], self.cfg["max_salt"])
                wave, remainder, requeue = politeness_dequeue_ds(ds, budget, hot)
                fr.set_blocks(remainder.materialize())
                fr.subtract_hosts(wave)
                if requeue.num_rows:
                    fr.subtract_hosts(requeue)
                    fr.add_table(requeue)
                if cap and wave.num_rows > cap:
                    fr.add_table(wave.slice(cap))
                    wave = wave.slice(0, cap)
        else:
            wave, remainder = dequeue_oldest_ds(ds, cap)
            fr.set_blocks(remainder.materialize())
            fr.subtract_hosts(wave)
        if wave.num_rows:
            # restore the frontier layout (pandas round-trips in the
            # dequeue can reorder columns)
            wave = wave.select([f.name for f in FRONTIER_SCHEMA]).cast(FRONTIER_SCHEMA)
        return wave

    # ------------------------------------------------------------- rounds

    def _run_round(self) -> bool:
        """One BSP round. Returns True if any work was done."""
        # manual enqueues (fetch_complete_hook / enqueue API)
        if self._manual:
            cands = candidate_table(self._manual)
            self._manual = []
            proc = CandidateProcessor(self.cfg, self.robots_cache)
            self._admit_candidates(proc(cands))

        with self._timed("dequeue"):
            wave = self._dequeue_wave()
        if wave.num_rows == 0:
            return False
        # terminal rows produced THIS round outside the fetch path
        # (robots-disallowed) — must reach the checkpoint too, or a
        # resume loses them (their hashes replay from checkpoint parquet)
        round_terminal: list = []

        # robots for hosts new this round (crawler.ts:1296-1335)
        if self.cfg["respect_robots_txt"]:
          with self._timed("robots"):
              hks = [f"{h}:{p or ''}"
                     for h, p in zip(wave.column("host").to_pylist(),
                                     wave.column("port").to_pylist())]
              schemes = _robots_schemes(hks,
                                        wave.column("protocol").to_pylist())
              sitemaps = self._fetch_robots(set(hks), schemes)
              if sitemaps is not None:
                  proc = CandidateProcessor(self.cfg, self.robots_cache)
                  self._admit_candidates(proc(sitemaps))
              # re-check wave rows against fresh rules; only hosts that
              # actually carry rules need the per-row path match (rules
              # are per-host — the common all-allowed host short-circuits)
              active = {hk for hk in set(hks)
                        if (r := self.robots_cache.get(hk)) is not None
                        and (r._rules or r.error)}
              if active:
                  allowed_mask = [
                      hk not in active or self.robots_cache[hk].is_allowed(u)
                      for hk, u in zip(hks, wave.column("url").to_pylist())
                  ]
              else:
                  allowed_mask = [True] * wave.num_rows
              allowed = pa.array(allowed_mask)
              disallowed = wave.filter(pc.invert(allowed))
              if disallowed.num_rows:
                  self._count("fetchdisallowed", disallowed.num_rows)
                  dis = disallowed.set_column(
                      disallowed.schema.get_field_index("status"),
                      "status", pa.array([STATUS_DISALLOWED] * disallowed.num_rows))
                  dis = dis.set_column(
                      dis.schema.get_field_index("fetched"),
                      "fetched", pa.array([True] * disallowed.num_rows))
                  for name, typ in zip(
                      PAYLOAD_COLS,
                      [pa.binary(), pa.string(), pa.string(), pa.string(), pa.string(),
                       pa.string(), pa.list_(pa.string()), pa.bool_()],
                  ):
                      dis = dis.append_column(name, pa.nulls(dis.num_rows, typ))
                  dis_ref = ray.put(_normalize_fetched(dis))
                  self.terminal_refs.append(dis_ref)
                  round_terminal.append(dis_ref)
                  wave = wave.filter(allowed)
              if wave.num_rows == 0:
                  with self._timed("checkpoint"):
                      self._checkpoint(round_terminal)
                  return True

        if self.cfg["track_fetch_order"]:
            self.fetch_order.extend(wave.column("url").to_pylist())
        self._count("fetchstart", wave.num_rows)

        # ---- distributed fetch+parse ----
        if self._web_ref is None:
            self._web_ref = ray.put(self.web)
        cfg_ref = self._cfg_broadcast()
        cache_ref = self._cache_broadcast()
        bs = self.cfg["batch_size"]
        # split the wave into blocks so the task pool actually parallelizes
        chunks = [wave.slice(off, bs) for off in range(0, wave.num_rows, bs)] or [wave]
        wave_ds = rd.from_arrow(chunks)
        # task-based UDF + worker-local state cache: per-worker init cost is
        # paid once per crawl, not once per round (see stages/fetch.py)
        with self._timed("fetch"):
            fetched_ds = wave_ds.map_batches(
                fetcher_udf,
                fn_kwargs=dict(web_ref=self._web_ref, cfg_ref=cfg_ref, cache_ref=cache_ref),
                batch_format="pyarrow",
                batch_size=bs,
                zero_copy_batch=True,
            ).materialize()
        with self._timed("fetch_gather"):
            # payload blocks never transit the driver: a worker task splits
            # each block into (normalized-ref kept in the object store,
            # thin body-less view) and only the thin part is pulled here
            want_body = self.fetch_complete_hook is not None
            norm_refs, thin_refs = [], []
            for r in fetched_ds.to_arrow_refs():
                n, t = _split_fetched_block.remote(r, want_body)
                norm_refs.append(n)
                thin_refs.append(t)
            thin_all = ray.get(thin_refs)
        keep = [i for i, t in enumerate(thin_all) if t.num_rows]
        if not keep:
            with self._timed("checkpoint"):
                self._checkpoint(round_terminal)
            return True
        round_refs = [norm_refs[i] for i in keep]
        self.terminal_refs.extend(round_refs)
        with self._timed("fetch_concat"):
            fetched_raw = pa.concat_tables([thin_all[i] for i in keep],
                                           promote_options="default")
            fetched = _normalize_fetched(fetched_raw)  # "discovered" stays transient

        # ---- metrics from dispositions ----
        _t_metrics = self._timed("metrics"); _t_metrics.__enter__()
        disp_counts = pc.value_counts(fetched.column("disposition"))
        for entry in disp_counts.to_pylist():
            if entry["values"]:
                self._count(entry["values"], entry["counts"])
        for flags in fetched.column("error_flags").to_pylist():
            for flag in (flags or "").split(","):
                if flag:
                    self._count(flag)
        ds_count = int(
            pc.sum(
                pc.and_(fetched.column("mime_supported"),
                        pc.equal(fetched.column("status"), "downloaded"))
            ).as_py() or 0
        )
        if self.cfg["discover"]:
            self._count("discoverycomplete", ds_count)

        _t_metrics.__exit__(None, None, None)
        # ---- cache index update (etag / last-modified) ----
        if self.use_cache:
            with self._timed("cache_index"):
                for u, hj, code in zip(fetched.column("url").to_pylist(),
                                       fetched.column("state_headers").to_pylist(),
                                       fetched.column("state_code").to_pylist()):
                    if hj and 200 <= code < 300:
                        h = json.loads(hj)
                        etag, lastmod = h.get("etag"), h.get("last-modified")
                        if etag or lastmod:
                            self.cache_index[u] = (etag, lastmod)

        # ---- redirect candidates (depth pinning + initial domain change) ----
        # filter to redirect rows FIRST (like turbo.py) — no O(fetched)
        # Python loop; the loop below touches only redirect rows.
        _t_redir = self._timed("redirects"); _t_redir.__enter__()
        redirect_cands = []
        redir_mask = pc.equal(fetched.column("disposition"), "fetchredirect")
        redirects = fetched.filter(redir_mask)
        n_non_redirect = fetched.num_rows - redirects.num_rows
        # first_request stays True through the initial redirect chain:
        # in seq order it flips on the first non-redirect row, so only
        # redirect rows with seq < that row's seq are "first requests"
        # (crawler.ts:1947-1953).
        first_cutoff = None
        if self.first_request and n_non_redirect:
            first_cutoff = pc.min(
                fetched.filter(pc.invert(redir_mask)).column("seq")).as_py()
        if redirects.num_rows:
            redirects = redirects.take(
                pc.sort_indices(redirects, sort_keys=[("seq", "ascending")]))
            for seq, url, depth, loc in zip(
                redirects.column("seq").to_pylist(),
                redirects.column("url").to_pylist(),
                redirects.column("depth").to_pylist(),
                redirects.column("location").to_pylist(),
            ):
                if not loc:
                    continue
                is_first = self.first_request and (
                    first_cutoff is None or seq < first_cutoff)
                target = process_url(loc, url, depth, CanonOpts(
                    strip_querystring=self.cfg["strip_querystring"],
                    sort_query_parameters=self.cfg["sort_query_parameters"],
                    strip_www_domain=self.cfg["strip_www_domain"]))
                override = 1 if is_first else -1
                if target is not None and is_first and self.cfg["allow_initial_domain_change"]:
                    self.cfg["host"] = target.host
                redirect_cands.append(dict(candidate=loc, referrer_url=url,
                                           referrer_depth=depth, parent_seq=seq,
                                           pos=0, depth_override=override))
        if n_non_redirect:
            self.first_request = False

        # ---- fetch-complete hooks (manual discovery, §2.10) ----
        if self.fetch_complete_batch_hook is not None:
            # batched form: one worker task per fetched block; only the
            # thin candidate list reaches the driver
            if self._batch_hook_ref is None:
                self._batch_hook_ref = ray.put(self.fetch_complete_batch_hook)
            for cands in ray.get([
                _batched_hook_block.remote(self._batch_hook_ref, r)
                for r in round_refs
            ]):
                self._manual.extend(cands)
        if self.fetch_complete_hook is not None:
            downloaded = fetched.filter(
                pc.equal(fetched.column("status"), "downloaded"))
            downloaded = downloaded.take(
                pc.sort_indices(downloaded, sort_keys=[("seq", "ascending")]))
            for row in downloaded.to_pylist():
                extra = self.fetch_complete_hook(row) or []
                for u in extra:
                    self._manual.append(dict(candidate=u, referrer_url=row["url"],
                                             referrer_depth=row["depth"],
                                             parent_seq=row["seq"], pos=0))

        _t_redir.__exit__(None, None, None)
        # ---- discovered candidates (explode + canonicalize) ----
        _t_cand = self._timed("candidates"); _t_cand.__enter__()
        max_depth = self.cfg["max_depth"]
        if fetched.num_rows <= 5000:
            # small wave: driver-side (per-round Dataset planning overhead
            # dominates actual work at this size); distributed path below is
            # byte-identical — same UDFs
            proc = CandidateProcessor(self.cfg, self.robots_cache)
            raw = explode_discovered(fetched_raw, max_depth)
            cand_tables = [proc(raw)] if raw.num_rows else []
        else:
            cfg_ref2 = self._cfg_broadcast()
            robots_ref = self._robots_broadcast()
            cand_ds = fetched_ds.map_batches(
                lambda b: explode_discovered(b, max_depth),
                batch_format="pyarrow", zero_copy_batch=True,
            ).map_batches(
                candidate_udf,
                fn_kwargs=dict(cfg_ref=cfg_ref2, robots_ref=robots_ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            from ..ops import gather_tables

            cand_tables = gather_tables(cand_ds)
        if redirect_cands:
            proc = CandidateProcessor(self.cfg, self.robots_cache)
            cand_tables.append(proc(candidate_table(redirect_cands)))
        _t_cand.__exit__(None, None, None)
        if cand_tables:
            with self._timed("admit"):
                all_cands = pa.concat_tables(cand_tables, promote_options="default")
                self._admit_candidates(all_cands)

        with self._timed("checkpoint"):
            self._checkpoint(round_refs + round_terminal)
        return True

    # ------------------------------------------------------------- public

    def run(self, max_rounds: int = 1000) -> "CrawlResult":
        self._count("crawlstart")
        self._seed()
        while self.round_no < max_rounds:
            progressed = self._run_round()
            self.round_no += 1
            if not progressed and not self._manual:
                # T6: open wait() handles hold completion (until done()
                # or listener_ttl); new manual enqueues resume rounds
                if self._wait_handles and self._drain_waits():
                    continue
                break
        ovf = self.seen.overflow()
        if ovf:
            # the cuckoo filter saturated past its victim stash: ovf
            # previously-seen keys were evicted and lost (their URLs
            # may be re-admitted if rediscovered) — surfaced as a
            # metric so an undersized filter is diagnosable
            self._count("seenoverflow", ovf)
        self._count("complete")
        return CrawlResult(self)

    def run_turbo(self, sink_dir: str, max_rounds: int = 100) -> dict:
        """Scale-path crawl: one fused map_batches per round (stages/turbo.py).

        Fetched rows stream to ``sink_dir`` parquet from the workers; the
        driver only merges thin new-frontier rows and applies politeness.
        Ordering is hash-seq (BFS-monotone across rounds, arbitrary within
        a round) — use ``run()`` when reference-exact FIFO matters.
        """
        from ..stages.turbo import split_meta, turbo_round_udf

        self._count("crawlstart")
        self._seed()
        self._sink_dir = sink_dir
        if self._web_ref is None:
            self._web_ref = ray.put(self.web)
        cfg_ref = ray.put(self.cfg)
        robots_ref = ray.put(self.robots_cache)
        fetched_total = 0
        bs = self.cfg["batch_size"]
        while self.round_no < max_rounds:
            if self._manual:
                cands = candidate_table(self._manual)
                self._manual = []
                proc = CandidateProcessor(self.cfg, self.robots_cache)
                self._admit_candidates(proc(cands))
            with self._timed("dequeue"):
                wave = self._dequeue_wave()
            if wave.num_rows == 0:
                break
            if self.cfg["respect_robots_txt"]:
                with self._timed("robots"):
                    # robots keys match CandidateProcessor: "host:port"
                    # built from the frontier columns (NOT host_key(), which
                    # expects a full URL — see round-1 advice)
                    hklist = [f"{h}:{p or ''}"
                              for h, p in zip(wave.column("host").to_pylist(),
                                              wave.column("port").to_pylist())]
                    hosts = set(hklist)
                    schemes = _robots_schemes(
                        hklist, wave.column("protocol").to_pylist())
                    hosts_new = hosts - self.robots_cache.keys()
                    if hosts_new:
                        # pass the FULL wave host set: _fetch_robots only
                        # fetches new hosts, but its cache eviction keeps
                        # `k in hosts` — passing just hosts_new could evict
                        # a current-wave host's rules, and the recheck
                        # below would treat it as allowed
                        sitemaps = self._fetch_robots(hosts, schemes)
                        if sitemaps is not None:
                            proc = CandidateProcessor(self.cfg, self.robots_cache)
                            self._admit_candidates(proc(sitemaps))
                        # the cache mutated (adds and/or evictions) exactly
                        # when new hosts were fetched — rebroadcast then.
                        # (len() equality is the wrong change detector: at
                        # steady state past the cap, adds == evictions and
                        # workers would keep a stale snapshot forever)
                        robots_ref = ray.put(self.robots_cache)
                    # re-check the dequeued wave against fresh rules: rows
                    # queued before their host's robots arrived (parity with
                    # _run_round crawl.py:372-396)
                    allowed = pa.array([
                        (self.robots_cache.get(f"{h}:{p or ''}") is None
                         or self.robots_cache[f"{h}:{p or ''}"].is_allowed(u))
                        for h, p, u in zip(wave.column("host").to_pylist(),
                                           wave.column("port").to_pylist(),
                                           wave.column("url").to_pylist())
                    ])
                    n_dis = wave.num_rows - int(pc.sum(allowed).as_py() or 0)
                    if n_dis:
                        self._count("fetchdisallowed", n_dis)
                        wave = wave.filter(allowed)
                    if wave.num_rows == 0:
                        self.round_no += 1
                        continue
            fetched_total += wave.num_rows
            with self._timed("turbo_round"):
                chunks = [wave.slice(o, bs) for o in range(0, wave.num_rows, bs)] or [wave]
                ds = rd.from_arrow(chunks).map_batches(
                    turbo_round_udf,
                    fn_kwargs=dict(web_ref=self._web_ref, cfg_ref=cfg_ref,
                                   robots_ref=robots_ref,
                                   seen_shards=self.seen.shards,
                                   round_no=self.round_no, sink_dir=sink_dir,
                                   first_request=self.first_request,
                                   first_seq=getattr(self, "_seed_seq", -1)),
                    batch_format="pyarrow",
                    batch_size=bs,
                    zero_copy_batch=True,
                )
                if self._frontier is not None:
                    # dataset backend: admitted rows NEVER transit the
                    # driver — each output block is bucketed worker-side
                    # and yielded as DRIVER-OWNED task returns (streaming
                    # generator; survives worker reap, round-3 advice #1).
                    # Only the thin (counters, meta) yield is ray.get here.
                    out = ds.materialize()
                    # observability: keep the last round's execution
                    # stats (string; cheap) for perf audits
                    self.last_round_stats = out.stats()
                    block_refs = [ref for bundle in
                                  out.iter_internal_ref_bundles()
                                  for ref, _meta in bundle.blocks]
                    gens = [
                        _adopt_frontier_block.remote(r, self._frontier.n_buckets)
                        for r in block_refs]
                    counters = {}
                    with self._timed("merge"):
                        for gen in gens:
                            meta_ref = next(gen)
                            part_refs = list(gen)  # driver-owned part refs
                            c, meta = ray.get(meta_ref)
                            for k, v in c.items():
                                if isinstance(v, str):
                                    counters[k] = v
                                else:
                                    counters[k] = counters.get(k, 0) + v
                            if meta:
                                self._frontier.adopt_parts([
                                    (b, ref, n, hc, smin, smax)
                                    for (b, n, hc, smin, smax), ref
                                    in zip(meta, part_refs)])
                else:
                    from ..ops import gather_tables as _gt

                    new_tables, counters = split_meta(_gt(ds))
            new_host = counters.pop("__new_host", None)
            if new_host and self.first_request \
                    and self.cfg["allow_initial_domain_change"]:
                # first-request redirect adopted a new crawl host
                # (crawler.ts:1951-1953) — rebroadcast the config
                self.cfg["host"] = new_host
                cfg_ref = ray.put(self.cfg)
            if counters.pop("__nonredirect", 0):
                self.first_request = False
            for k, v in counters.items():
                self._count(k, v)
            if self._frontier is None:
                with self._timed("merge"):
                    if new_tables:
                        merged = pa.concat_tables(new_tables)
                        self.queued = (pa.concat_tables([self.queued, merged])
                                       if self.queued.num_rows else merged)
            if self.cfg["checkpoint_dir"]:
                with self._timed("checkpoint"):
                    self._checkpoint_state()
            self.round_no += 1
        ovf = self.seen.overflow()
        if ovf:
            # the cuckoo filter saturated past its victim stash: ovf
            # previously-seen keys were evicted and lost (their URLs
            # may be re-admitted if rediscovered) — surfaced as a
            # metric so an undersized filter is diagnosable
            self._count("seenoverflow", ovf)
        self._count("complete")
        return {"fetched": fetched_total, "rounds": self.round_no,
                "metrics": dict(self.metrics), "sink_dir": sink_dir}

    def _write_queued_state(self, tmp: str) -> None:
        """Checkpoint the queued frontier: one driver write (driver
        backend) or one worker-side write per block (dataset backend —
        queued rows never transit the driver)."""
        if self._frontier is not None:
            refs = self._frontier.refs
            if refs:
                ray.get([
                    _write_block.remote(r, os.path.join(tmp, f"queued-{i:04d}.parquet"))
                    for i, r in enumerate(refs)
                ])
            else:
                pq.write_table(FRONTIER_SCHEMA.empty_table(),
                               os.path.join(tmp, "queued.parquet"))
        else:
            pq.write_table(self.queued, os.path.join(tmp, "queued.parquet"))

    def _load_queued_ckpt(self, last_dir: str) -> pa.Table:
        """Load a checkpointed frontier into the active backend; returns
        the driver view (for url_hash seen-replay)."""
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(last_dir, "queued*.parquet")))
        tables = [pq.read_table(f) for f in files]
        t = (pa.concat_tables(tables, promote_options="default")
             if tables else FRONTIER_SCHEMA.empty_table())
        if self._frontier is not None:
            for tb in tables:
                self._frontier.add_table(tb)
        else:
            self.queued = t
        return t

    def _checkpoint_state(self) -> None:
        """Turbo-mode checkpoint: queued frontier + counters (the
        fetched rows are already durably in the sink's round=N parts).
        With ``checkpoint_seen``, each seen shard also snapshots its
        filter (one .npz per shard, written by the shard actor) so
        resume is O(filter bytes) instead of replaying every crawled
        url_hash from the sink."""
        ckpt = self.cfg["checkpoint_dir"]
        rdir = os.path.join(ckpt, f"state-round={self.round_no:05d}")
        tmp = rdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        self._write_queued_state(tmp)
        if self.cfg["checkpoint_seen"]:
            self.seen.snapshot(os.path.join(tmp, "seen"))
        with open(os.path.join(tmp, "metrics.json"), "w") as f:
            json.dump({"round": self.round_no, "next_seq": self.next_seq,
                       "first_request": self.first_request,
                       "seed_seq": getattr(self, "_seed_seq", -1),
                       "metrics": self.metrics,
                       "seen_shards": self.cfg["seen_shards"],
                       "seen_backend": self.cfg["seen_backend"],
                       "host": self.cfg["host"],
                       "lineage": self._lineage_manifest()}, f)
        os.replace(tmp, rdir)

    def _lineage_manifest(self) -> "dict | None":
        """Per-partition lineage for this round's sink output: the
        part files the round produced and their row counts (parquet
        FOOTER reads only — no row data touches the driver).  A
        resumed or auditing run can tell exactly which partitions are
        complete without scanning them."""
        sink_dir = getattr(self, "_sink_dir", None)
        if not sink_dir:
            return None
        rdn = f"round={self.round_no:05d}"
        rdir = os.path.join(sink_dir, rdn)
        if not os.path.isdir(rdir):
            return {rdn: []}
        parts = [{"file": fn,
                  "rows": pq.read_metadata(os.path.join(rdir, fn)).num_rows}
                 for fn in sorted(os.listdir(rdir))
                 if fn.endswith(".parquet")]
        return {rdn: parts}

    @classmethod
    def resume_turbo(cls, web, initial_url: str, checkpoint_dir: str,
                     sink_dir: str, **options) -> "CrawlEngine":
        """Resume a turbo crawl: reload the last queued frontier and
        replay the seen-set from sink parquet + queued url_hash."""
        import glob

        eng = cls(web, initial_url, checkpoint_dir=checkpoint_dir, **options)
        states = sorted(d for d in os.listdir(checkpoint_dir)
                        if d.startswith("state-round=")
                        and not d.endswith(".tmp"))
        if not states:
            return eng
        last = os.path.join(checkpoint_dir, states[-1])
        meta = json.load(open(os.path.join(last, "metrics.json")))
        eng.round_no = meta["round"] + 1
        eng.next_seq = meta["next_seq"]
        eng.first_request = meta["first_request"]
        # restore the seed seq: with first_request still true the
        # first-request redirect special-casing keys off it, and the
        # seed is only assigned a seq at initial admission
        if meta.get("seed_seq", -1) >= 0:
            eng._seed_seq = meta["seed_seq"]
        eng.metrics = meta["metrics"]
        eng.cfg["host"] = meta["host"]
        qt = eng._load_queued_ckpt(last)
        seen_dir = os.path.join(last, "seen")
        restored = False
        if os.path.isdir(seen_dir) \
                and meta.get("seen_shards") == eng.cfg["seen_shards"] \
                and meta.get("seen_backend", eng.cfg["seen_backend"]) \
                == eng.cfg["seen_backend"]:
            # snapshot fast path: reload each shard's filter file —
            # O(filter bytes), not O(crawled URLs)
            try:
                eng.seen.restore(seen_dir)
                restored = True
            except ValueError:
                # e.g. a snapshot from an older fingerprint format —
                # fall back to the url_hash replay below
                restored = False
        if not restored:
            hashes = [qt.column("url_hash").to_numpy(zero_copy_only=False)]
            for part in glob.glob(os.path.join(sink_dir, "round=*", "*.parquet")):
                hashes.append(
                    pq.read_table(part, columns=["url_hash"])
                    .column("url_hash").to_numpy(zero_copy_only=False))
            eng.seen.add(np.concatenate(hashes).astype(np.uint64))
        return eng

    def _checkpoint(self, fetched_refs: list) -> None:
        ckpt = self.cfg["checkpoint_dir"]
        if not ckpt:
            return
        rdir = os.path.join(ckpt, f"round={self.round_no:05d}")
        tmp = rdir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        # each block written from a worker (normalized refs: no
        # "discovered", payloads never hop through the driver)
        ray.get([
            _write_block.remote(r, os.path.join(tmp, f"fetched-{i:04d}.parquet"))
            for i, r in enumerate(fetched_refs)
        ])
        self._write_queued_state(tmp)
        if self.cfg["checkpoint_seen"]:
            self.seen.snapshot(os.path.join(tmp, "seen"))
        with open(os.path.join(tmp, "metrics.json"), "w") as f:
            json.dump({"round": self.round_no, "next_seq": self.next_seq,
                       "first_request": self.first_request,
                       "seed_seq": getattr(self, "_seed_seq", -1),
                       "metrics": self.metrics,
                       "seen_shards": self.cfg["seen_shards"],
                       "seen_backend": self.cfg["seen_backend"],
                       "host": self.cfg["host"]}, f)
        os.replace(tmp, rdir)  # atomic publish: resumable (ray_guide layout)

    @classmethod
    def resume(cls, web, initial_url: str, checkpoint_dir: str, **options) -> "CrawlEngine":
        """Defrost (S4): rebuild frontier + replay seen-set from the last
        completed round checkpoint."""
        eng = cls(web, initial_url, checkpoint_dir=checkpoint_dir, **options)
        # a crash between makedirs(tmp) and the atomic os.replace leaves
        # a half-written "*.tmp" dir — never treat it as a checkpoint
        rounds = sorted(d for d in os.listdir(checkpoint_dir)
                        if d.startswith("round=") and not d.endswith(".tmp"))
        if not rounds:
            return eng
        last = os.path.join(checkpoint_dir, rounds[-1])
        meta = json.load(open(os.path.join(last, "metrics.json")))
        eng.round_no = meta["round"] + 1
        eng.next_seq = meta["next_seq"]
        eng.first_request = meta["first_request"]
        # restore the seed seq: with first_request still true the
        # first-request redirect special-casing keys off it, and the
        # seed is only assigned a seq at initial admission
        if meta.get("seed_seq", -1) >= 0:
            eng._seed_seq = meta["seed_seq"]
        eng.metrics = meta["metrics"]
        eng.cfg["host"] = meta["host"]
        qt = eng._load_queued_ckpt(last)
        # replay seen from every checkpointed round (fetched + queued);
        # a seen snapshot (checkpoint_seen) short-circuits the hash
        # replay — blocks are still re-pinned for queue-state queries
        import glob as _glob

        seen_dir = os.path.join(last, "seen")
        have_snapshot = (os.path.isdir(seen_dir)
                         and meta.get("seen_shards") == eng.cfg["seen_shards"]
                         and meta.get("seen_backend",
                                      eng.cfg["seen_backend"])
                         == eng.cfg["seen_backend"])
        if have_snapshot:
            try:
                eng.seen.restore(seen_dir)
            except ValueError:
                # e.g. a snapshot from an older fingerprint format —
                # fall back to the url_hash replay
                have_snapshot = False
        hashes = [qt.column("url_hash").to_numpy(zero_copy_only=False)]
        for rdir in rounds:
            parts = sorted(
                _glob.glob(os.path.join(checkpoint_dir, rdir, "fetched*.parquet")))
            for part in parts:
                if not have_snapshot:
                    t = pq.read_table(part, columns=["url_hash"])
                    hashes.append(
                        t.column("url_hash").to_numpy(zero_copy_only=False))
                eng.terminal_refs.append(ray.put(pq.read_table(part)))
        if not have_snapshot:
            eng.seen.add(np.concatenate(hashes).astype(np.uint64))
        return eng


class CrawlResult:
    def __init__(self, engine: CrawlEngine):
        self.engine = engine
        self.metrics = engine.metrics
        self.fetch_order = engine.fetch_order
        self.robots_errors = engine.robots_errors

    def fetched_dataset(self) -> rd.Dataset:
        if not self.engine.terminal_refs:
            return rd.from_arrow(FRONTIER_SCHEMA.empty_table())
        return rd.from_arrow_refs(list(self.engine.terminal_refs))

    def fetched_table(self) -> pa.Table:
        refs = self.engine.terminal_refs
        if not refs:
            return FRONTIER_SCHEMA.empty_table()
        tables = [ray.get(r) for r in refs]
        tables = [t.drop_columns([c for c in ("discovered",) if c in t.column_names]) for t in tables]
        t = pa.concat_tables(tables, promote_options="default")
        return t.take(pc.sort_indices(t, sort_keys=[("seq", "ascending")]))

    def frontier_table(self) -> pa.Table:
        """Full queue state: terminal + still-queued rows, seq order."""
        term = self.fetched_table()
        cols = [c for c in term.column_names if c in FRONTIER_SCHEMA.names]
        term = term.select(cols)
        qt = self.engine.queued_table()
        q = qt.select(cols) if qt.num_rows else None
        t = pa.concat_tables([term, q]) if q is not None else term
        return t.take(pc.sort_indices(t, sort_keys=[("seq", "ascending")]))

    def downloaded_urls(self) -> list[str]:
        t = self.fetched_table()
        mask = pc.equal(t.column("status"), "downloaded")
        return t.filter(mask).column("url").to_pylist()

    def events_table(self) -> pa.Table:
        """The events-as-data view (§2.10): one row per emitted event
        (disposition + error flags), replacing the reference's callback
        event API with a queryable table."""
        t = self.fetched_table()
        base = t.select(["seq", "url", "round"])
        disp = pc.coalesce(t.column("disposition"), "")
        parts = []
        # one event row per non-empty disposition (vectorized filter)
        disp_rows = base.append_column("event", disp).filter(
            pc.not_equal(disp, ""))
        parts.append(disp_rows.select(["seq", "url", "event", "round"]))
        # error flags: "a,b" -> one row per flag, exploded via the Arrow
        # list kernels (split -> flatten + parent_indices), no row loop
        if "error_flags" in t.column_names:
            flags = pc.coalesce(t.column("error_flags"), "")
            lists = pc.split_pattern(flags, ",")
            flat = pc.list_flatten(lists)
            sel = base.take(pc.list_parent_indices(lists))
            flag_rows = sel.append_column("event", flat).filter(
                pc.not_equal(flat, ""))
            parts.append(flag_rows.select(["seq", "url", "event", "round"]))
        out = pa.concat_tables(parts)
        out = out.take(pc.sort_indices(out, sort_keys=[("seq", "ascending")]))
        return pa.table({
            "seq": out.column("seq").cast(pa.int64()),
            "url": out.column("url"),
            "event": out.column("event"),
            "round": out.column("round").cast(pa.int32()),
        })

    def shutdown(self):
        self.engine.seen.shutdown()


def sink_dataset(sink_dir: str, dedup: bool = False) -> "rd.Dataset":
    """Read a turbo crawl's fetched output back as a Dataset.  Rows are
    at-least-once across resume boundaries; pass ``dedup=True`` to keep
    one row per url (the highest-round fetch wins — one
    groupby(url_hash) shuffle, row payloads move once)."""
    ds = rd.read_parquet(sink_dir)
    if not dedup:
        return ds

    def keep_latest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("round", kind="stable").tail(1)

    return ds.groupby("url_hash").map_groups(keep_latest,
                                             batch_format="pandas")
