"""Approximate-nearest-neighbor search over an embedding column.

* ``knn_bruteforce`` — baseline: broadcast the query matrix (ray.put
  once), per-batch numpy matmul, per-batch local top-k, tiny driver
  merge.  Exact; scales linearly — the right baseline for oracle
  checks.
* ``IvfIndex`` (``fit`` / ``search``) — scale path: k-means coarse
  quantizer (trained on a sample), vectors partitioned by nearest
  centroid (one groupby), queries probe only ``nprobe`` partitions.
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
        if batch.num_rows == 0:  # empty Ray block: np.stack([]) raises
            return pa.table({id_col: batch.column(id_col),
                             "cos": pa.array([], pa.float64())})
        qv = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(np.stack(batch.column(emb_col).to_pylist()).astype(np.float64))
        sims = (m @ qv.T).ravel()
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "cos": pa.array(sims[order].astype(np.float64))})

    from ..ops import gather_tables

    parts = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    tables = gather_tables(parts)
    if not tables:  # empty corpus
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    merged = pa.concat_tables(tables, promote_options="default").to_pandas()
    merged = merged.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(merged, preserve_index=False)


def knn_bruteforce_multi(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
                         id_col: str = "vec_id",
                         emb_col: str = "embedding") -> pa.Table:
    """Batched exact cosine top-k: the (m x d) query matrix broadcasts
    ONCE (ray.put), each block does one (block x m) matmul and emits its
    local top-k per query; the driver merges m*k*blocks thin rows.
    Returns (query_id, vec_id, cos) sorted by query_id, cos desc,
    vec_id — the batched-inference shape: at 10^10 rows the work per
    block is one GEMM, not m scans."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    m = q.shape[0]
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty Ray block: np.stack([]) raises
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: batch.column(id_col),
                             "cos": pa.array([], pa.float64())})
        qm = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(np.stack(batch.column(emb_col).to_pylist()).astype(np.float64))
        sims = mat @ qm.T  # (rows, m)
        out_q, out_i, out_c = [], [], []
        for j in range(m):
            order = np.lexsort((ids, -sims[:, j]))[:k]
            out_q.append(np.full(len(order), j, dtype=np.int64))
            out_i.append(ids[order])
            out_c.append(sims[order, j])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_i)),
            "cos": pa.array(np.concatenate(out_c).astype(np.float64)),
        })

    from ..ops import gather_tables

    parts = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    tables = gather_tables(parts)
    if not tables:  # empty corpus
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    merged = pa.concat_tables(tables, promote_options="default").to_pandas()
    merged = (merged.sort_values(["query_id", "cos", id_col],
                                 ascending=[True, False, True])
              .groupby("query_id", sort=True).head(k))
    return pa.Table.from_pandas(merged.reset_index(drop=True), preserve_index=False)


@ray.remote
def _list_ids_of(block) -> list[int]:
    # blocks may arrive as pandas (map_groups output) or Arrow; empty
    # blocks may carry no columns at all
    if isinstance(block, pd.DataFrame):
        return [] if "list_id" not in block.columns else [int(x) for x in block["list_id"]]
    if "list_id" not in block.column_names:
        return []
    return block.column("list_id").to_pylist()


@ray.remote
def _search_list(block, row: int, q: np.ndarray, k: int):
    """Scan one inverted list (one packed row of a block) worker-side."""
    if isinstance(block, pd.DataFrame):
        ids_b = block["ids"].iloc[row]
        dim = int(block["dim"].iloc[row])
        vecs_b = block["vecs"].iloc[row]
        vdt = block["vdtype"].iloc[row]
    else:
        ids_b = block.column("ids")[row].as_py()
        dim = int(block.column("dim")[row].as_py())
        vecs_b = block.column("vecs")[row].as_py()
        vdt = block.column("vdtype")[row].as_py()
    ids = np.frombuffer(ids_b, dtype=np.int64)
    vecs = np.frombuffer(vecs_b, dtype=np.dtype(vdt)).reshape(-1, dim)
    sims = (vecs @ q.T).ravel()
    order = np.lexsort((ids, -sims))[:k]
    return ids[order], sims[order]


class IvfIndex:
    """IVF coarse index: centroids trained on a driver-side sample; the
    inverted lists live in the Ray OBJECT STORE, not on the driver —
    fit() shuffles (id, vec, list_id) once via groupby(list_id) and the
    driver keeps only ``{list_id: (block_ref, row)}`` pointers, so its
    memory is independent of corpus size (round-1 scale debt: the old
    index was a driver-resident dict of every vector).  search() probes
    the nprobe nearest lists with one remote scan task each and merges
    nprobe×k rows."""

    def __init__(self, n_lists: int = 16, seed: int = 42, iters: int = 10,
                 dtype: str = "float32"):
        self.n_lists = n_lists
        self.seed = seed
        self.iters = iters
        # float32 halves list memory; float64 makes exhaustive-probe
        # search bit-match the float64 brute-force/SQL oracle
        self.dtype = np.dtype(dtype)
        self.centroids: np.ndarray | None = None
        # list_id -> (packed block ObjectRef, row index within block)
        self._list_refs: dict[int, tuple] = {}
        self._packed = None  # keeps the materialized blocks alive

    def fit(self, ds: rd.Dataset, emb_col: str = "embedding",
            id_col: str = "vec_id", sample_n: int = 10_000) -> "IvfIndex":
        # randomize BLOCK order before taking the training sample: a
        # plain limit() reads the corpus prefix, and crawl output is
        # written in crawl/domain order, so prefix-trained centroids
        # would model a few topics and funnel everything else into a
        # handful of giant lists (poor recall at fixed nprobe)
        sample = ds.randomize_block_order(seed=self.seed) \
                   .limit(sample_n).take_all()
        x = _normalize(np.stack([r[emb_col] for r in sample]).astype(self.dtype))
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
        vdtype = self.dtype

        def assign_batch(batch: pa.Table) -> pa.Table:
            cc = ray.get(c_ref)
            m = _normalize(np.stack(batch.column(emb_col).to_pylist()).astype(cc.dtype))
            lst = (m @ cc.T).argmax(axis=1).astype(np.int32)
            return pa.table({id_col: batch.column(id_col),
                             emb_col: batch.column(emb_col),
                             "list_id": pa.array(lst)})

        def pack(group: pd.DataFrame) -> pd.DataFrame:
            # one packed row per inverted list: ids + L2-normalized vecs
            # as contiguous blobs (scan-ready, no per-row object refs)
            ids = group[id_col].to_numpy(dtype=np.int64)
            vecs = _normalize(np.stack(group[emb_col].to_list()).astype(vdtype))
            return pd.DataFrame({
                "list_id": [int(group["list_id"].iloc[0])],
                "n": [len(ids)],
                "dim": [vecs.shape[1]],
                "vdtype": [vdtype.str],
                "ids": [ids.tobytes()],
                "vecs": [vecs.tobytes()],
            })

        # one shuffle co-locates each inverted list; blocks stay in the
        # object store — the driver reads only the tiny list_id column
        self._packed = (
            ds.map_batches(assign_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("list_id")
            .map_groups(pack, batch_format="pandas")
            .materialize()
        )
        self._list_refs = {}
        for ref in self._packed.to_arrow_refs():
            for i, lid in enumerate(ray.get(_list_ids_of.remote(ref))):
                self._list_refs[int(lid)] = (ref, i)
        return self

    def search(self, query: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
        q = _normalize(np.asarray(query, dtype=self.dtype).reshape(1, -1))
        probes = (q @ self.centroids.T).ravel().argsort()[::-1][:nprobe]
        futures = []
        for lid in probes:
            ptr = self._list_refs.get(int(lid))
            if ptr is not None:
                futures.append(_search_list.remote(ptr[0], ptr[1], q, k))
        if not futures:
            return pd.DataFrame({"vec_id": [], "cos": []})
        results = ray.get(futures)
        ids = np.concatenate([r[0] for r in results])
        sims = np.concatenate([r[1] for r in results])
        order = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame({"vec_id": ids[order], "cos": sims[order].astype(float)})
