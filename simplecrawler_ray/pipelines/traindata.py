"""End-to-end training-data pipeline over a document corpus: the
composition a 100 TB crawl feeds — every stage is one of this repo's
operators, chained as lazy Dataset transforms (one streaming plan, no
driver materialization until the final summary):

    documents ──► exact dedup (hash groupby, min-id wins)
              ──► quality + token filters (vectorized map_batches)
              ──► deterministic train/val/test split (stable hash)
              ──► train split packed into <= max_tokens bins

``run_training_pipeline`` returns per-stage row counts + pack stats —
the numbers a data engineer checks before a training run.  The input
can be a parquet directory (e.g. a crawl sink's captions) or any
Dataset with (doc_id, text).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.dedup import content_hash_batch
from ..functions.packing import add_split_column, pack_sequences
from ..functions.text import quality_batch, token_count_batch
from ..ops import groupby_agg


def run_training_pipeline(ds: rd.Dataset, *, max_tokens: int = 512,
                          min_tokens: int = 5, max_digit_frac: float = 0.3,
                          val_frac: float = 0.1, test_frac: float = 0.05,
                          id_col: str = "doc_id",
                          near_dup: bool = False,
                          jaccard_threshold: float = 0.7) -> dict:
    """Dedup -> [near-dup cluster dedup] -> quality filter -> split ->
    pack; returns summary stats.

    With ``near_dup=True`` the exact-dedup survivors additionally go
    through MinHash+LSH pairing -> connected components -> keep the
    component-min representative (``functions/graph.dedup_keep_min``),
    so whole CLUSTERS of near-identical docs collapse to one row, not
    just byte-identical ones.
    """
    n_input = ds.count()

    # 1. exact dedup: min-id per content hash; only (hash, id) shuffles,
    #    then an inner join back picks the surviving rows
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, "text"),
        batch_format="pyarrow", zero_copy_batch=True)
    keep_ids = groupby_agg(
        hashed.map_batches(lambda b: b.select(["content_hash", id_col]),
                           batch_format="pyarrow", zero_copy_batch=True),
        ["content_hash"], {id_col: ("min", id_col)})
    keep_ids = keep_ids.map_batches(
        lambda b: b.select([id_col]) if hasattr(b, "select") else b[[id_col]],
        batch_format="pyarrow")
    # semi join back: only surviving ids pass, no driver-side id set
    from ..ops import hash_join

    # materialize once: both the quality branch and the dedup count below
    # consume this — without it the whole read->hash->groupby->join chain
    # would execute twice (round-2 q_train_pipeline was 10x query median).
    deduped = hash_join(ds, keep_ids, on=id_col, n_buckets=8,
                        how="semi").materialize()

    # 1b. optional near-dup pass: pairs -> components -> keep min id
    n_near_dropped = 0
    n_exact = deduped.count()  # materialized: metadata-only count
    if near_dup:
        from ..functions.dedup import minhash_lsh_pairs
        from ..functions.graph import dedup_keep_min

        pairs = minhash_lsh_pairs(deduped, id_col=id_col,
                                  jaccard_threshold=jaccard_threshold)
        if pairs.num_rows:
            deduped = dedup_keep_min(deduped, pairs, id_col=id_col,
                                     id_a="id_a", id_b="id_b").materialize()
            n_near_dropped = n_exact - deduped.count()

    # 2. quality + token filters (vectorized counts)
    def quality_filter(batch: pa.Table) -> pa.Table:
        b = token_count_batch(quality_batch(batch))
        toks = b.column("n_tokens")
        chars = pc.cast(b.column("n_chars_m"), pa.float64())
        digits = pc.cast(b.column("n_digit"), pa.float64())
        frac_digit = pc.divide(digits, pc.max_element_wise(chars, 1.0))
        mask = pc.and_(pc.greater_equal(toks, min_tokens),
                       pc.less_equal(frac_digit, max_digit_frac))
        return b.filter(mask).select([id_col, "text", "n_tokens"])

    filtered = deduped.map_batches(quality_filter, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # 3. split + 4. pack (train only) — still lazy until counted
    split = add_split_column(filtered, key_col=id_col, val_frac=val_frac,
                             test_frac=test_frac).materialize()
    counts = {r["split"]: r["n"] for t in _gather(
        groupby_agg(split, ["split"], {"n": ("count", id_col)}))
        for r in t.to_pylist()}

    def only_train(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("split"), "train"))

    train = split.map_batches(only_train, batch_format="pyarrow")
    packs = pack_sequences(train, max_tokens=max_tokens, id_col=id_col,
                           token_col="n_tokens").materialize()
    pack_stats = packs.aggregate(
        rd.aggregate.Count(),
        rd.aggregate.Sum("total_tokens"),
        rd.aggregate.Mean("total_tokens"),
    )
    return {
        "n_input": n_input,
        "n_after_dedup": n_exact,
        "n_near_dup_dropped": n_near_dropped,
        "n_after_quality": sum(counts.values()),
        "n_train": counts.get("train", 0),
        "n_val": counts.get("val", 0),
        "n_test": counts.get("test", 0),
        "n_packs": int(pack_stats["count()"]),
        "packed_tokens": int(pack_stats["sum(total_tokens)"]),
        "mean_pack_fill": float(pack_stats["mean(total_tokens)"]) / max_tokens,
    }


def _gather(ds) -> list:
    from ..ops import gather_tables

    return gather_tables(ds)
