"""Approximate-nearest-neighbor search over an embedding column.

* ``knn_bruteforce`` — baseline: broadcast the query matrix (ray.put
  once), per-batch numpy matmul, per-batch local top-k, tiny driver
  merge.  Exact; scales linearly — the right baseline for oracle
  checks.
* ``IvfIndex`` / ``knn_ivf`` — scale path: k-means coarse quantizer
  (trained on a sample), vectors partitioned by nearest centroid
  (one groupby), queries probe only ``nprobe`` partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    n[n == 0] = 1
    return m / n


def knn_bruteforce(ds: rd.Dataset, query: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", emb_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k of one query vector. Returns (vec_id, cos)
    sorted by cos desc, vec_id asc tie-break."""
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(np.stack(batch.column(emb_col).to_pylist()).astype(np.float64))
        sims = (m @ qv.T).ravel()
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "cos": pa.array(sims[order].astype(np.float64))})

    from ..ops import gather_tables

    parts = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    merged = pa.concat_tables(gather_tables(parts),
                              promote_options="default").to_pandas()
    merged = merged.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(merged, preserve_index=False)


class IvfIndex:
    """IVF coarse index: centroids trained on a driver-side sample, the
    partition step is a single distributed pass."""

    def __init__(self, n_lists: int = 16, seed: int = 42, iters: int = 10):
        self.n_lists = n_lists
        self.seed = seed
        self.iters = iters
        self.centroids: np.ndarray | None = None
        self._partitions: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def fit(self, ds: rd.Dataset, emb_col: str = "embedding",
            id_col: str = "vec_id", sample_n: int = 10_000) -> "IvfIndex":
        sample = ds.limit(sample_n).take_all()
        x = _normalize(np.stack([r[emb_col] for r in sample]).astype(np.float32))
        rng = np.random.default_rng(self.seed)
        c = x[rng.choice(len(x), min(self.n_lists, len(x)), replace=False)]
        for _ in range(self.iters):  # spherical k-means on the sample
            assign = (x @ c.T).argmax(axis=1)
            for j in range(len(c)):
                pts = x[assign == j]
                if len(pts):
                    c[j] = _normalize(pts.mean(axis=0, keepdims=True))[0]
        self.centroids = c
        c_ref = ray.put(c)

        def assign_batch(batch: pa.Table) -> pa.Table:
            cc = ray.get(c_ref)
            m = _normalize(np.stack(batch.column(emb_col).to_pylist()).astype(np.float32))
            lst = (m @ cc.T).argmax(axis=1).astype(np.int32)
            return pa.table({id_col: batch.column(id_col),
                             emb_col: batch.column(emb_col),
                             "list_id": pa.array(lst)})

        assigned = ds.map_batches(assign_batch, batch_format="pyarrow",
                                  zero_copy_batch=True)
        # one shuffle: co-locate each inverted list
        from ..ops import gather_tables

        for t in gather_tables(assigned):
            df = t.to_pandas()
            for lid, g in df.groupby("list_id"):
                ids = g[id_col].to_numpy()
                vecs = _normalize(np.stack(g[emb_col].to_list()).astype(np.float32))
                if lid in self._partitions:
                    pids, pvecs = self._partitions[lid]
                    self._partitions[lid] = (np.concatenate([pids, ids]),
                                             np.concatenate([pvecs, vecs]))
                else:
                    self._partitions[lid] = (ids, vecs)
        return self

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        q = _normalize(np.asarray(query, dtype=np.float32).reshape(1, -1))
        probes = (q @ self.centroids.T).ravel().argsort()[::-1][:nprobe]
        ids_all, sims_all = [], []
        for lid in probes:
            part = self._partitions.get(int(lid))
            if part is None:
                continue
            ids, vecs = part
            sims = (vecs @ q.T).ravel()
            ids_all.append(ids)
            sims_all.append(sims)
        if not ids_all:
            return pd.DataFrame({"vec_id": [], "cos": []})
        ids = np.concatenate(ids_all)
        sims = np.concatenate(sims_all)
        order = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame({"vec_id": ids[order], "cos": sims[order].astype(float)})
