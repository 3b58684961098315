"""Candidate processing: explode discovered links -> canonicalize ->
domain/robots/depth/condition filters.

Mirrors the reference enqueue path ``queueLinkedItems`` -> ``queueURL``
(src/crawler.ts:1079-1093, 1483-1538): maxDepth gate before queueURL
(discovered links only — redirects bypass it), then processURL (M2),
domainValid (M7), urlIsAllowed (M8), fetch conditions (§2.10), then the
global dedup (queue.add, D1) which lives in pipelines/crawl.py.

Rejections become ``reject_reason`` values matching the reference's
event names (invaliddomain, fetchdisallowed, fetchprevented,
fetchconditionerror) so event counters are derivable (A8).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..robots import RobotsRules
from ..sources.web import url_hash64
from ..conditions import eval_condition
from ..discovery import _SCHEME_RE
from ..urlnorm import CanonOpts, domain_valid, process_url
from ..schemas import frontier_row_defaults

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("protocol", pa.string()),
        ("host", pa.string()),
        ("port", pa.int32()),
        ("path", pa.string()),
        ("uri_path", pa.string()),
        ("depth", pa.int32()),
        ("referrer", pa.string()),
        ("parent_seq", pa.int64()),
        ("pos", pa.int32()),
        ("forced", pa.bool_()),
        ("reject_reason", pa.string()),
    ]
)


def explode_discovered(batch: pa.Table, max_depth: int) -> pa.Table:
    """fetched rows -> raw candidate rows (candidate, referrer ctx, pos).

    Depth gate: enqueue only if maxDepth == 0 or depth+1 <= maxDepth
    (src/crawler.ts:1086-1090).
    """
    urls, depths, seqs, cands, poss = [], [], [], [], []
    d_col = batch.column("discovered").to_pylist()
    u_col = batch.column("url").to_pylist()
    dep_col = batch.column("depth").to_pylist()
    seq_col = batch.column("seq").to_pylist()
    for u, dep, seq, disc in zip(u_col, dep_col, seq_col, d_col):
        if not disc:
            continue
        if max_depth != 0 and dep + 1 > max_depth:
            continue
        for pos, cand in enumerate(disc):
            urls.append(u)
            depths.append(dep)
            seqs.append(seq)
            cands.append(cand)
            poss.append(pos)
    return pa.table(
        {
            "candidate": pa.array(cands, pa.string()),
            "referrer_url": pa.array(urls, pa.string()),
            "referrer_depth": pa.array(depths, pa.int32()),
            "parent_seq": pa.array(seqs, pa.int64()),
            "pos": pa.array(poss, pa.int32()),
            "forced": pa.array([False] * len(cands), pa.bool_()),
            "depth_override": pa.array([-1] * len(cands), pa.int32()),
        }
    )


def candidate_table(cands: list[dict]) -> pa.Table:
    """Build a raw-candidate table from dicts (redirects, sitemaps, manual
    enqueues). Keys: candidate, referrer_url, referrer_depth, parent_seq,
    pos, forced, depth_override."""
    return pa.table(
        {
            "candidate": pa.array([c["candidate"] for c in cands], pa.string()),
            "referrer_url": pa.array([c.get("referrer_url", "") for c in cands], pa.string()),
            "referrer_depth": pa.array([c.get("referrer_depth", 0) for c in cands], pa.int32()),
            "parent_seq": pa.array([c.get("parent_seq", -1) for c in cands], pa.int64()),
            "pos": pa.array([c.get("pos", 0) for c in cands], pa.int32()),
            "forced": pa.array([c.get("forced", False) for c in cands], pa.bool_()),
            "depth_override": pa.array([c.get("depth_override", -1) for c in cands], pa.int32()),
        }
    )


def candidate_udf(batch: pa.Table, *, cfg_ref, robots_ref) -> pa.Table:
    """Task-based map_batches wrapper with worker-local processor cache
    (see stages/fetch.py rationale)."""
    from .fetch import _WORKER_CACHE, _ref_key

    key = ("candproc", _ref_key(cfg_ref), _ref_key(robots_ref))
    p = _WORKER_CACHE.get(key)
    if p is None:
        for k in [k for k in _WORKER_CACHE if k[0] == "candproc"]:
            del _WORKER_CACHE[k]
        p = CandidateProcessor(cfg_ref, robots_ref)
        _WORKER_CACHE[key] = p
    return p(batch)


class CandidateProcessor:
    """map_batches UDF: raw candidates -> canonical candidate rows with
    reject_reason ('' == kept).  Stateless w.r.t. rows; config + robots
    snapshot resolved once per actor/task from ray.put refs."""

    def __init__(self, config_ref, robots_ref):
        cfg = ray.get(config_ref) if isinstance(config_ref, ray.ObjectRef) else config_ref
        self.cfg = cfg
        self.canon = CanonOpts(
            strip_querystring=cfg.get("strip_querystring", False),
            sort_query_parameters=cfg.get("sort_query_parameters", False),
            strip_www_domain=cfg.get("strip_www_domain", False),
            url_encoding=cfg.get("url_encoding", "unicode"),
        )
        robots = ray.get(robots_ref) if isinstance(robots_ref, ray.ObjectRef) else robots_ref
        self.robots: dict[str, RobotsRules] = robots or {}
        self.fetch_conditions = cfg.get("fetch_conditions") or []
        # canonical-row cache for ABSOLUTE candidates: absolute_to() is a
        # no-op when the candidate has a scheme, so url/host/port/path are
        # referrer-independent — popular links (nav bars, rings) repeat
        # across documents and skip the parse+normalize entirely.  depth
        # and referrer are recomputed per row below.
        self._row_cache: dict[str, "object"] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        crawl_host = cfg.get("host", "")
        n = batch.num_rows
        cands = batch.column("candidate").to_pylist()
        refs = batch.column("referrer_url").to_pylist()
        rdepths = batch.column("referrer_depth").to_pylist()
        pseqs = batch.column("parent_seq").to_pylist()
        poss = batch.column("pos").to_pylist()
        forced = batch.column("forced").to_pylist()
        overrides = batch.column("depth_override").to_pylist()

        out = {name: [] for name in CANDIDATE_SCHEMA.names}
        # per-batch caches: referrers repeat per document; domain verdicts
        # repeat per host (both checked per candidate otherwise)
        from ..urlnorm import Uri

        ref_cache: dict[str, Uri] = {}
        domain_cache: dict[str, bool] = {}
        _unset = ref_cache  # any sentinel distinct from None/UrlRow
        for i in range(n):
            ref = refs[i]
            base = ref_cache.get(ref)
            if base is None:
                base = Uri.parse(ref or "")
                ref_cache[ref] = base
            cand = cands[i]
            absolute = bool(_SCHEME_RE.match(cand))
            hit = self._row_cache.get(cand, _unset) if absolute else _unset
            if hit is _unset:
                row = process_url(cand, base, rdepths[i], self.canon,
                                  referrer_str=ref)
                uh = url_hash64(row.url) if row is not None else 0
                if absolute:
                    if len(self._row_cache) > 500_000:
                        self._row_cache.clear()
                    self._row_cache[cand] = (row, uh)
            else:
                row, uh = hit
            if row is None:
                continue  # urijs choke — silently dropped (queueURL:1497-1500)
            # depth/referrer are row-specific (cached rows carry stale ones)
            depth = overrides[i] if overrides[i] >= 0 else rdepths[i] + 1
            reason = ""
            dv = domain_cache.get(row.host)
            if dv is None:
                dv = domain_valid(
                    row.host, crawl_host,
                    filter_by_domain=cfg.get("filter_by_domain", True),
                    ignore_www_domain=cfg.get("ignore_www_domain", True),
                    scan_subdomains=cfg.get("scan_subdomains", False),
                    domain_whitelist=cfg.get("domain_whitelist"),
                )
                domain_cache[row.host] = dv
            if not dv:
                reason = "invaliddomain"
            elif cfg.get("respect_robots_txt", True):
                hk = f"{row.host}:{row.port or ''}"
                rules = self.robots.get(hk)
                if rules is not None and not rules.is_allowed_path(row.path):
                    reason = "fetchdisallowed"
            if not reason and self.fetch_conditions:
                qi = {
                    "url": row.url, "host": row.host, "path": row.path,
                    "port": row.port, "protocol": row.protocol, "depth": depth,
                    "referrer": ref,
                }
                # two-arg conditions get the referrer item — the
                # reference's (queueItem, referrerQueueItem) shape
                ref_item = {"url": ref, "depth": depth - 1} if ref else None
                for cond in self.fetch_conditions:
                    try:
                        ok = eval_condition(cond, qi, ref_item)
                    except Exception:
                        reason = "fetchconditionerror"
                        break
                    if not ok:
                        reason = "fetchprevented"
                        break
            out["url"].append(row.url)
            out["url_hash"].append(uh)
            out["protocol"].append(row.protocol)
            out["host"].append(row.host)
            out["port"].append(row.port)
            out["path"].append(row.path)
            out["uri_path"].append(row.uri_path)
            out["depth"].append(depth)
            out["referrer"].append(ref)
            out["parent_seq"].append(pseqs[i])
            out["pos"].append(poss[i])
            out["forced"].append(bool(forced[i]))
            out["reject_reason"].append(reason)
        return pa.table(
            {f.name: pa.array(out[f.name], f.type) for f in CANDIDATE_SCHEMA}
        )


def candidates_to_frontier_rows(cands: pa.Table, seqs: list[int], round_no: int) -> pa.Table:
    """Kept candidates + assigned seq -> frontier-schema queued rows."""
    n = cands.num_rows
    defaults = frontier_row_defaults()
    data = {
        "seq": pa.array(seqs, pa.int64()),
        "url": cands.column("url"),
        "url_hash": cands.column("url_hash"),
        "protocol": cands.column("protocol"),
        "host": cands.column("host"),
        "port": cands.column("port"),
        "path": cands.column("path"),
        "uri_path": cands.column("uri_path"),
        "depth": cands.column("depth"),
        "referrer": cands.column("referrer"),
        "fetched": pa.array([defaults["fetched"]] * n, pa.bool_()),
        "status": pa.array([defaults["status"]] * n, pa.string()),
        "state_request_latency_ms": pa.array([0] * n, pa.int32()),
        "state_request_time_ms": pa.array([0] * n, pa.int32()),
        "state_download_time_ms": pa.array([0] * n, pa.int32()),
        "state_content_length": pa.array([0] * n, pa.int64()),
        "state_content_type": pa.array([""] * n, pa.string()),
        "state_code": pa.array([0] * n, pa.int16()),
        "state_headers": pa.array([""] * n, pa.string()),
        "state_actual_data_size": pa.array([0] * n, pa.int64()),
        "state_sent_incorrect_size": pa.array([False] * n, pa.bool_()),
        "round": pa.array([round_no] * n, pa.int32()),
    }
    return pa.table(data)
