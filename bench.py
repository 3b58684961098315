"""Benchmark harness.

Headline: frontier throughput (URLs dequeued+fetched/s) and dedup-checked
URLs/s on a synthetic frontier over the ScaleWeb image+caption corpus
(BASELINE.json metric), plus per-query timings of the relational/
training-data pipelines at $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

--scaling: runs the headline pipeline in two fresh processes at
RAY_GRAFT_CPUS=8 and =32 on the same input and reports throughput at
both plus scaling efficiency (north-rule N vs 4N evidence; a real
multi-node cluster is not available in this sandbox).
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "40000"))
DEDUP_URLS = int(os.environ.get("BENCH_DEDUP_URLS", "2000000"))


def _init_ray():
    import ray

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    logging.getLogger("ray").setLevel(logging.ERROR)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def bench_crawl() -> dict:
    """Headline: BSP crawl of the ScaleWeb corpus graph."""
    from simplecrawler_ray.pipelines.crawl import CrawlEngine
    from simplecrawler_ray.sources.web import ScaleWeb

    sw = ScaleWeb(n_pages=CRAWL_PAGES, n_hosts=256, out_degree=6, image_side=16)
    eng = CrawlEngine(
        sw, sw.url_of(0), filter_by_domain=False, store_body=False,
        seen_shards=8, seen_backend="cuckoo",
        seen_capacity_per_shard=max(1 << 18, CRAWL_PAGES),
        batch_size=2048, fetcher_concurrency=NUM_CPUS,
    )
    # multi-seed so the BFS reaches the whole graph in few rounds
    for s in range(1, 64):
        eng.enqueue(sw.url_of((CRAWL_PAGES * s) // 64))
    t0 = time.time()
    res = eng.run(max_rounds=30)
    dt = time.time() - t0
    fetched = len(res.fetch_order)
    checked = res.metrics.get("queueadd", 0) + res.metrics.get("queueduplicate", 0)
    eng.seen.shutdown()
    return {
        "sec": dt,
        "urls_fetched": fetched,
        "urls_per_sec": fetched / dt,
        "dedup_checked": checked,
        "rounds": res.engine.round_no,
    }


def bench_dedup() -> dict:
    """Dedup-checked URLs/s through the sharded cuckoo seen-set."""
    import numpy as np

    from simplecrawler_ray.state.seen import SeenSet

    seen = SeenSet(num_shards=min(16, NUM_CPUS), backend="cuckoo",
                   capacity_per_shard=max(1 << 18, DEDUP_URLS // 8))
    rng = np.random.default_rng(42)
    # ~30% duplicates, like a crawl frontier
    uniq = rng.integers(1, 2**63, int(DEDUP_URLS * 0.7)).astype(np.uint64)
    dups = rng.choice(uniq, DEDUP_URLS - len(uniq))
    hashes = np.concatenate([uniq, dups])
    rng.shuffle(hashes)
    batch = 524288
    t0 = time.time()
    new_total = 0
    for off in range(0, len(hashes), batch):
        new_total += int(seen.check_and_add(hashes[off: off + batch]).sum())
    dt = time.time() - t0
    seen.shutdown()
    return {"sec": dt, "urls_checked": len(hashes),
            "checked_per_sec": len(hashes) / dt, "new": new_total}


def bench_queries() -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name, fn in qs.items():
        if name in ("crawl_conformance", "crawl_scaleweb"):
            continue  # covered by the headline crawl
        t0 = time.time()
        fn(SF_DIR)
        out[name] = round(time.time() - t0, 3)
    return out


def run_once() -> dict:
    _init_ray()
    crawl = bench_crawl()
    dedup = bench_dedup()
    queries = bench_queries()
    result = {
        "metric": ("frontier throughput (URLs dequeued+fetched/sec) and "
                   "dedup-checked URLs/sec over ScaleWeb image+caption corpus"),
        "value": round(crawl["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "num_cpus": NUM_CPUS,
        "crawl_urls_per_sec": round(crawl["urls_per_sec"], 1),
        "crawl_urls_fetched": crawl["urls_fetched"],
        "crawl_rounds": crawl["rounds"],
        "dedup_checked_per_sec": round(dedup["checked_per_sec"], 1),
        "dedup_urls_checked": dedup["urls_checked"],
    }
    import ray

    ray.shutdown()
    return result


def run_scaling() -> dict:
    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, __file__, "--headline-only"], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = child(lo), child(hi)
    thr_lo = r_lo["crawl_urls_per_sec"]
    thr_hi = r_hi["crawl_urls_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "urls_per_sec_lo": thr_lo, "urls_per_sec_hi": thr_hi,
        "dedup_per_sec_lo": r_lo["dedup_checked_per_sec"],
        "dedup_per_sec_hi": r_hi["dedup_checked_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


def run_headline_only() -> dict:
    _init_ray()
    crawl = bench_crawl()
    dedup = bench_dedup()
    result = {
        "value": round(crawl["sec"], 3),
        "unit": "sec",
        "num_cpus": NUM_CPUS,
        "crawl_urls_per_sec": round(crawl["urls_per_sec"], 1),
        "dedup_checked_per_sec": round(dedup["checked_per_sec"], 1),
    }
    import ray

    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--headline-only" in sys.argv:
        print(json.dumps(run_headline_only()))
    else:
        print(json.dumps(run_once()))
