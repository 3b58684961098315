"""Training-batch preparation operators: sequence packing + splits.

* ``pack_sequences`` — greedy packing of documents into <= max_tokens
  bins for LLM training.  Global bin packing is inherently sequential,
  so the distributed shape is: partition docs deterministically by
  ``id % n_partitions`` (one groupby shuffle of thin rows), then each
  partition packs ITS docs in id order — results are independent of
  Ray block boundaries, so repeated runs bit-match.
* ``add_split_column`` — deterministic train/val/test tagging by a
  stable 64-bit hash of the key column (split follows the DOCUMENT, not
  the row position: re-sharding or re-ordering the corpus never moves a
  document across splits — the property a 100 TB pipeline needs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def pack_sequences(ds: rd.Dataset, max_tokens: int, id_col: str = "doc_id",
                   token_col: str = "n_tokens",
                   n_partitions: int = 32) -> rd.Dataset:
    """Greedy first-fit (in id order) packing per deterministic
    partition.  Returns one row per pack: (partition, pack_index,
    n_docs, total_tokens, doc_ids).  A document longer than
    ``max_tokens`` gets its own pack (never truncated here — length
    policy belongs to the tokenizer stage)."""

    def to_part(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        part = (ids % n_partitions).astype(np.int32)
        return pa.table({
            id_col: batch.column(id_col),
            token_col: batch.column(token_col),
            "__part": pa.array(part),
        })

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        part = int(g["__part"].iloc[0])
        packs, cur_ids, cur_tok = [], [], 0
        for i, t in zip(g[id_col].to_numpy(), g[token_col].to_numpy()):
            t = int(t)
            if cur_ids and cur_tok + t > max_tokens:
                packs.append((cur_ids, cur_tok))
                cur_ids, cur_tok = [], 0
            cur_ids.append(int(i))
            cur_tok += t
        if cur_ids:
            packs.append((cur_ids, cur_tok))
        return pd.DataFrame({
            "partition": [part] * len(packs),
            "pack_index": list(range(len(packs))),
            "n_docs": [len(p[0]) for p in packs],
            "total_tokens": [p[1] for p in packs],
            "doc_ids": [p[0] for p in packs],
        })

    return (ds.map_batches(to_part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__part")
            .map_groups(pack, batch_format="pandas"))


def add_split_column(ds: rd.Dataset, key_col: str = "doc_id",
                     val_frac: float = 0.1, test_frac: float = 0.0,
                     seed: int = 0, out_col: str = "split") -> rd.Dataset:
    """Tag each row train/val/test by ``md5_low64(seed:key) % 10^6`` —
    stable across runs, shards and orderings.  md5-low64 (little-endian
    int of md5 bytes [8:16]) is used rather than an ad-hoc hash because
    DuckDB's ``md5_number_lower`` computes the identical value, so the
    split is SQL-oracle-checkable end to end."""
    import hashlib

    scale = 1_000_000
    val_cut = int(val_frac * scale)
    test_cut = val_cut + int(test_frac * scale)

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        buckets = np.array(
            [int.from_bytes(hashlib.md5(f"{seed}:{k}".encode()).digest()[8:],
                            "little") % scale
             for k in keys])
        split = np.where(buckets < val_cut, "val",
                         np.where(buckets < test_cut, "test", "train"))
        return batch.append_column(out_col, pa.array(split.tolist(), pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def sample_fraction(ds: rd.Dataset, frac: float, key_col: str = "doc_id",
                    seed: int = 0) -> rd.Dataset:
    """Deterministic Bernoulli sample: keep rows whose
    ``md5_low64(seed:key) % 10^6 < frac * 10^6``.

    Pure per-batch filter — NO shuffle, no RNG state; the same key is
    kept or dropped identically across runs, shards and re-orderings
    (and in a resumed pipeline), unlike ``Dataset.random_sample``.
    Same md5-low64 trick as ``add_split_column``: DuckDB's
    ``md5_number_lower`` computes the identical value, so the sample
    is SQL-oracle-checkable.
    """
    import hashlib

    scale = 1_000_000
    cut = int(frac * scale)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        buckets = np.fromiter(
            (int.from_bytes(hashlib.md5(f"{seed}:{k}".encode()).digest()[8:],
                            "little") % scale for k in keys),
            dtype=np.int64, count=len(keys))
        return batch.filter(pa.array(buckets < cut))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
