"""Distributed graph operators: connected components and dup-cluster
assignment — the third leg of the dedup story (pairs -> clusters ->
keep-one representative).

``connected_components`` implements alternating large-star /
small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", ACM SoCC 2014): every iteration is a pair of
bucketed groupby shuffles plus a canonical dedup pass, and the
algorithm converges in O(log^2 n) iterations, so the operator scales
to edge sets far beyond driver memory.  The only per-iteration driver
traffic is a (row-count, 64-bit checksum) convergence signature.

Groups are bucketed (``n_buckets`` pandas groups, per-node work
vectorized inside each bucket) rather than grouped per node — the
group-per-key shape measured ~10x slower on this engine's as-of join
and near-dup pairing (see functions/dedup.py:hash_near_dup_pairs).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_PHI = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 vector (bucket/checksum hash)."""
    with np.errstate(over="ignore"):
        x = (x + _PHI).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * _MIX1
        x = (x ^ (x >> np.uint64(27))) * _MIX2
        return x ^ (x >> np.uint64(31))


def _edges_dataset(edges, src: str, dst: str) -> rd.Dataset:
    """Accept a Dataset or a driver-side Arrow table/pandas frame of
    pairs (our dedup ops return driver-side pair tables)."""
    if isinstance(edges, rd.Dataset):
        return edges
    if isinstance(edges, pd.DataFrame):
        edges = pa.Table.from_pandas(edges, preserve_index=False)
    edges = edges.select([src, dst])
    if edges.num_rows == 0:
        return rd.from_arrow(edges)
    # rd.from_arrow(table) is ONE block — slice for parallelism
    step = max(1, min(edges.num_rows, 65536))
    return rd.from_arrow([edges.slice(o, step)
                          for o in range(0, edges.num_rows, step)])


def _cols(batch, a: str, b: str):
    if isinstance(batch, pd.DataFrame):
        return (batch[a].to_numpy().astype(np.int64),
                batch[b].to_numpy().astype(np.int64))
    return (batch.column(a).to_numpy(zero_copy_only=False).astype(np.int64),
            batch.column(b).to_numpy(zero_copy_only=False).astype(np.int64))


def _large_star(edges: rd.Dataset, n_buckets: int) -> rd.Dataset:
    """For each node u (over symmetrized edges), point every neighbor
    v > u at m = min(N(u) + {u})."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        s, d = _cols(batch, "src", "dst")
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        keep = u != v
        u, v = u[keep], v[keep]
        bucket = (_mix64(u.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"u": u, "v": v, "__bucket": bucket})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                              "dst": pd.Series([], dtype="int64")})
        if len(g) == 0 or "u" not in g.columns:
            return empty
        g = g.drop_duplicates(["u", "v"])
        gmin = g.groupby("u")["v"].min()
        m = pd.Series(np.minimum(gmin.to_numpy(), gmin.index.to_numpy()),
                      index=gmin.index)
        mm = g["u"].map(m).to_numpy()
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        keep = v > u  # v > u >= m, so no self-loops survive
        if not keep.any():
            return empty
        return pd.DataFrame({"src": v[keep], "dst": mm[keep]}).drop_duplicates()

    return (edges.map_batches(symmetrize, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("__bucket").map_groups(per_bucket, batch_format="pandas"))


def _small_star(edges: rd.Dataset, n_buckets: int) -> rd.Dataset:
    """Orient edges high->low; for each node u point u and every
    smaller neighbor at m = min(N(u)).  Output edges keep src > dst."""

    def orient(batch) -> pa.Table:
        s, d = _cols(batch, "src", "dst")
        u = np.maximum(s, d)
        v = np.minimum(s, d)
        keep = u != v
        u, v = u[keep], v[keep]
        bucket = (_mix64(u.astype(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"u": u, "v": v, "__bucket": bucket})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                              "dst": pd.Series([], dtype="int64")})
        if len(g) == 0 or "u" not in g.columns:
            return empty
        g = g.drop_duplicates(["u", "v"])
        gmin = g.groupby("u")["v"].min()  # all v < u, so m = min(N(u))
        mm = g["u"].map(gmin).to_numpy()
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        keep = v != mm
        out = pd.DataFrame({
            "src": np.concatenate([u, v[keep]]),
            "dst": np.concatenate([mm, mm[keep]]),
        })
        return out.drop_duplicates()

    return (edges.map_batches(orient, batch_format="pyarrow")
            .groupby("__bucket").map_groups(per_bucket, batch_format="pandas"))


def _canonical(edges: rd.Dataset, n_buckets: int):
    """Globally dedup the (high->low oriented) edge multiset and return
    (materialized dataset, (count, checksum)) — the signature is
    order/partition-independent (uint64 sum of pair hashes mod 2^64),
    so signature equality across rounds detects the fixpoint."""

    def bucketize(batch) -> pa.Table:
        s, d = _cols(batch, "src", "dst")
        u = np.maximum(s, d)
        v = np.minimum(s, d)
        keep = u != v
        u, v = u[keep], v[keep]
        h = _mix64(u.astype(np.uint64) ^ _mix64(v.astype(np.uint64)))
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"src": u, "dst": v, "__bucket": bucket})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "src" not in g.columns:
            return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                 "dst": pd.Series([], dtype="int64")})
        return g.drop_duplicates(["src", "dst"])[["src", "dst"]]

    ded = (edges.map_batches(bucketize, batch_format="pyarrow")
           .groupby("__bucket").map_groups(per_bucket, batch_format="pandas")
           .materialize())

    def partial(batch) -> pa.Table:
        s, d = _cols(batch, "src", "dst")
        h = _mix64(s.astype(np.uint64) ^ _mix64(d.astype(np.uint64)))
        with np.errstate(over="ignore"):
            tot = np.uint64(h.sum(dtype=np.uint64)) if len(h) else np.uint64(0)
        return pa.table({"n": pa.array([len(s)], pa.int64()),
                         "s": pa.array([int(tot)], pa.uint64())})

    parts = ded.map_batches(partial, batch_format="pyarrow").take_all()
    count = sum(p["n"] for p in parts)
    csum = 0
    for p in parts:
        csum = (csum + int(p["s"])) & 0xFFFFFFFFFFFFFFFF
    return ded, (count, csum)


def _union_find_labels(tables: list[pa.Table]) -> pa.Table:
    """Driver-side union-find (path-halving) over gathered edge tables;
    returns the (node, component-min) label table sorted by node."""
    if not tables:
        return pa.table({"node": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    t = pa.concat_tables(tables, promote_options="default")
    s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = s != d  # match distributed semantics: loop-only nodes absent
    s, d = s[keep], d[keep]
    if not len(s):
        return pa.table({"node": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)
    si, di = inv[:len(s)], inv[len(s):]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(si.tolist(), di.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min ORIGINAL id so the root is the component min
            if nodes[ra] < nodes[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "component": pa.array(nodes[roots], pa.int64())})


def connected_components(edges, src: str = "src", dst: str = "dst",
                         n_buckets: "int|None" = None,
                         max_rounds: int = 64,
                         small_threshold: int = 200_000) -> rd.Dataset:
    """Connected components over an undirected edge list.

    Returns a Dataset with columns ``(node, component)`` where
    ``component`` is the minimum node id in the node's component —
    covering every node incident to at least one (non-loop) edge.
    Singleton nodes don't appear (callers left-join and default to the
    node's own id; see ``dup_clusters``).

    ``edges`` may be a Dataset or a driver-side Arrow/pandas pair
    table (the shape our near-dup operators return).

    Graphs at or below ``small_threshold`` deduped edges take a
    driver-side union-find fast path (the canonical-dedup pass has
    already counted them, and near-dup pair sets are tiny relative to
    the corpus); larger graphs run the distributed star contraction,
    whose per-round shuffles would otherwise dominate small inputs.

    ``n_buckets=None`` (the default here and in the dedup wrappers)
    derives the contraction bucket count from the raw edge count
    (``max(32, ceil(edges / TARGET_ROWS_PER_BUCKET))``, measured
    before the first canonical pass so no pass ever runs under-
    bucketed) — one bucket is one pandas frame per star round, so it
    must scale with the graph, not sit at a fixed 32.
    """
    if not isinstance(edges, rd.Dataset):
        tbl = (pa.Table.from_pandas(edges, preserve_index=False)
               if isinstance(edges, pd.DataFrame) else edges)
        if tbl.num_rows <= small_threshold:
            # driver-side pairs under the cap: no Ray work at all
            # (duplicate edges are harmless to union-find)
            tbl = pa.table({"src": tbl.column(src), "dst": tbl.column(dst)})
            return rd.from_arrow(_union_find_labels([tbl]))
    cur = _edges_dataset(edges, src, dst)
    if src != "src" or dst != "dst":
        cur = cur.map_batches(
            lambda b, s=src, d=dst: pa.table(
                {"src": b.column(s), "dst": b.column(d)}),
            batch_format="pyarrow", zero_copy_batch=True)
    if n_buckets is None:
        # size the contraction buckets from the RAW edge count BEFORE
        # the first canonical pass — deriving it after would run that
        # measuring pass itself at a fixed bucket count, recreating
        # the rows/32-per-frame blowup the sizing exists to prevent
        # (raw >= deduped, so this only over-provisions buckets)
        from ..ops import _resolve_buckets
        cur, n_buckets = _resolve_buckets(cur, None)
    cur, sig = _canonical(cur, n_buckets)
    if sig[0] == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "component": pa.array([], pa.int64())}))
    if sig[0] <= small_threshold:
        from ..ops import gather_tables
        return rd.from_arrow(_union_find_labels(gather_tables(cur)))
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur, n_buckets), n_buckets)
        nxt, nsig = _canonical(nxt, n_buckets)
        cur = nxt
        if nsig == sig:
            break
        sig = nsig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(theoretical bound is O(log^2 n) — raise max_rounds)")

    # fixpoint edges are star edges (v -> component min); component
    # roots only ever appear as dst
    def expand(batch) -> pa.Table:
        s, d = _cols(batch, "src", "dst")
        node = np.concatenate([s, d])
        comp = np.concatenate([d, d])
        bucket = (_mix64(node.astype(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"node": node, "component": comp, "__bucket": bucket})

    def label_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "component": pd.Series([], dtype="int64")})
        return (g.groupby("node", as_index=False)["component"].min())

    return (cur.map_batches(expand, batch_format="pyarrow")
            .groupby("__bucket").map_groups(label_bucket, batch_format="pandas"))


def group_star_edges(ds: rd.Dataset, key_cols: list[str],
                     id_col: str = "doc_id",
                     n_buckets: int = 32) -> rd.Dataset:
    """Star edges ``(src=id, dst=group-min id)`` for the equivalence
    relation "equal values in ``key_cols``" — the bridge from any
    exact-match dedup key (content fingerprint, (lang, length), simhash
    chunk...) to the graph operators above.  One bucketed shuffle on a
    hash of the key; per-group min is a vectorized pandas transform
    inside each bucket, so hot keys cost O(group) not O(group^2).
    """
    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        # null keys define no equivalence (SQL NULL-never-equals):
        # pandas groupby would drop them but transform('min') then
        # yields NaN, which .astype(int64) turns into INT64_MIN —
        # cross-linking every null-keyed doc into one garbage cluster
        df = df.dropna(subset=key_cols)
        h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
        out = df[[id_col] + key_cols].copy()
        out["__bucket"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                              "dst": pd.Series([], dtype="int64")})
        if len(g) == 0 or id_col not in g.columns:
            return empty
        gmin = g.groupby(key_cols)[id_col].transform("min").to_numpy()
        ids = g[id_col].to_numpy()
        keep = ids != gmin
        if not keep.any():
            return empty
        return pd.DataFrame({"src": ids[keep].astype(np.int64),
                             "dst": gmin[keep].astype(np.int64)})

    return (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("__bucket").map_groups(per_bucket, batch_format="pandas"))


def dup_clusters(ds: rd.Dataset, pairs, id_col: str = "doc_id",
                 id_a: str = "id_a", id_b: str = "id_b",
                 n_buckets: "int|None" = None,
                 broadcast_max_nodes: int = 5_000_000) -> rd.Dataset:
    """Assign every row of ``ds`` a ``cluster`` id: the minimum id in
    its near-dup component (own id for rows in no pair).

    ``pairs`` is any near-dup pair output (``minhash_lsh_pairs``,
    ``simhash_near_dup_pairs``, ``exact`` pair lists...) as a Dataset
    or driver-side table with ``id_a``/``id_b`` columns.  Labels cover
    only nodes that appear in pairs — at most 2x the pair count — so
    they are broadcast (``ray.put`` once, mapped per batch) up to
    ``broadcast_max_nodes`` and joined via the partitioned hash join
    beyond that.
    """
    labels = connected_components(pairs, src=id_a, dst=id_b,
                                  n_buckets=n_buckets).materialize()
    n_labels = labels.count()
    if n_labels <= broadcast_max_nodes:
        from ..ops import gather_tables
        tabs = gather_tables(labels)
        lab = (pa.concat_tables(tabs).to_pandas() if tabs
               else pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                  "component": pd.Series([], dtype="int64")}))
        lab_ref = ray.put(pd.Series(lab["component"].to_numpy(),
                                    index=lab["node"].to_numpy()))

        def assign(batch: pa.Table) -> pa.Table:
            m = ray.get(lab_ref)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            comp = pd.Series(ids).map(m).fillna(pd.Series(ids)).astype(np.int64)
            return batch.append_column("cluster",
                                       pa.array(comp.to_numpy(), pa.int64()))

        return ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)

    from ..ops import _resolve_buckets, hash_join
    labels = labels.map_batches(
        lambda b: pa.table({id_col: b.column("node"),
                            "cluster": b.column("component")}),
        batch_format="pyarrow", zero_copy_batch=True)
    if n_buckets is None:
        # the join shuffles the CORPUS, so its bucket count must be
        # derived from ds, not from the (much smaller) label graph
        ds, n_buckets = _resolve_buckets(ds, None)
    joined = hash_join(ds, labels, on=id_col, n_buckets=n_buckets, how="left")

    def fill(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cl = batch.column("cluster").to_numpy(zero_copy_only=False)
        cl = np.where(pd.isna(cl), ids, cl).astype(np.int64)
        i = batch.schema.get_field_index("cluster")
        return batch.set_column(i, "cluster", pa.array(cl, pa.int64()))

    return joined.map_batches(fill, batch_format="pyarrow")


def dedup_keep_min(ds: rd.Dataset, pairs, id_col: str = "doc_id",
                   id_a: str = "id_a", id_b: str = "id_b",
                   n_buckets: "int|None" = None,
                   broadcast_max_drop: int = 5_000_000) -> rd.Dataset:
    """Keep one representative per near-dup cluster: the row whose id
    is the component minimum (singletons always survive).  The
    non-representative id set is at most 2x the pair count; up to
    ``broadcast_max_drop`` ids it is broadcast (``ray.put`` once) and
    each batch filters locally — no shuffle of ``ds``.  Past the
    threshold (a 100 TB corpus with a high dup rate would otherwise
    gather tens of GB on the driver) the drop set stays distributed
    and ``ds`` is filtered with the partitioned ANTI join — one
    shuffle, nothing on the driver."""
    labels = connected_components(pairs, src=id_a, dst=id_b,
                                  n_buckets=n_buckets)

    def non_reps(batch) -> pa.Table:
        n, c = _cols(batch, "node", "component")
        drop = n[n != c]
        return pa.table({"drop": drop})

    drops_ds = labels.map_batches(non_reps,
                                  batch_format="pyarrow").materialize()
    if drops_ds.count() > broadcast_max_drop:
        from ..ops import _resolve_buckets, anti_join
        if n_buckets is None:
            # the anti join shuffles the CORPUS — bucket count must
            # scale with ds, not with the label graph's edge count
            ds, n_buckets = _resolve_buckets(ds, None)
        return anti_join(ds, drops_ds, id_col, right_on="drop",
                         n_buckets=n_buckets)

    from ..ops import gather_tables
    tabs = gather_tables(drops_ds)
    drop = (pa.concat_tables(tabs).column("drop").to_numpy(zero_copy_only=False)
            if tabs else np.array([], dtype=np.int64))
    drop_ref = ray.put(np.sort(drop.astype(np.int64)))

    def keep_batch(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if not len(d):
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # sorted-array membership: searchsorted beats np.isin's re-sort
        pos = np.searchsorted(d, ids)
        pos[pos == len(d)] = 0
        mask = d[pos] != ids
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
