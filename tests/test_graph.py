"""Connected components / dup clustering (functions/graph.py).

Reference implementation: a driver-side union-find, checked against the
distributed large-star/small-star operator on structured and randomized
graphs.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from simplecrawler_ray.functions.graph import (
    connected_components, dedup_keep_min, dup_clusters, group_star_edges)


def _uf_components(edges):
    """Union-find reference: {node: min id of its component}."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(edges, **kw):
    tbl = pa.table({"src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64())})
    out = connected_components(tbl, **kw).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["node"].tolist(), out["component"].tolist()))


# small_threshold=0 forces the distributed star-contraction path; the
# default exercises the driver-side union-find fast path
@pytest.mark.parametrize("st", [200_000, 0])
def test_cc_chain_star_clique(st):
    edges = (
        [(i, i + 1) for i in range(10, 20)]          # chain 10..20
        + [(100, v) for v in range(101, 108)]         # star at 100
        + [(a, b) for a in range(200, 205)            # clique 200..204
           for b in range(a + 1, 205)]
        + [(300, 301)]                                # lone pair
    )
    got = _run_cc(edges, small_threshold=st)
    want = {n: c for n, c in _uf_components(edges).items()}
    assert got == want
    assert got[19] == 10 and got[107] == 100 and got[204] == 200


@pytest.mark.parametrize("st", [200_000, 0])
def test_cc_self_loops_duplicates_and_reversed_edges(st):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (2, 3), (3, 2), (9, 9)]
    got = _run_cc(edges, small_threshold=st)
    # pure self-loop nodes are singletons -> absent from the labels
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_empty():
    assert _run_cc([]) == {}


def test_cc_long_path_needs_multiple_rounds():
    # a 200-node path has diameter 199: naive min-propagation needs ~200
    # rounds; star contraction must converge in O(log^2 n)
    edges = [(i, i + 1) for i in range(1000, 1200)]
    got = _run_cc(edges, max_rounds=25, small_threshold=0)
    assert set(got.values()) == {1000}
    assert len(got) == 201


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_randomized_vs_union_find(seed):
    rng = np.random.default_rng(seed)
    n = 300
    m = 400
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, n, size=(m, 2)) if a != b]
    want = _uf_components(edges)
    assert _run_cc(edges) == want                       # fast path
    assert _run_cc(edges, small_threshold=0) == want    # distributed


def test_cc_accepts_dataset_and_custom_columns():
    tbl = pa.table({"id_a": pa.array([1, 2, 50], pa.int64()),
                    "id_b": pa.array([2, 3, 60], pa.int64())})
    ds = rd.from_arrow(tbl)
    out = connected_components(ds, src="id_a", dst="id_b").to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {1: 1, 2: 1, 3: 1, 50: 50, 60: 50}


def test_dup_clusters_assigns_and_defaults_to_own_id():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(8)]),
    }))
    pairs = pa.table({"id_a": pa.array([0, 1, 5], pa.int64()),
                      "id_b": pa.array([1, 2, 6], pa.int64())})
    out = dup_clusters(docs, pairs).to_pandas().sort_values("doc_id")
    assert out["cluster"].tolist() == [0, 0, 0, 3, 4, 5, 5, 7]


def test_dup_clusters_hash_join_path_matches_broadcast():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64())}))
    pairs = pa.table({"id_a": pa.array([0, 1, 10], pa.int64()),
                      "id_b": pa.array([1, 2, 11], pa.int64())})
    bc = (dup_clusters(docs, pairs).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    hj = (dup_clusters(docs, pairs, broadcast_max_nodes=0)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc[["doc_id", "cluster"]],
                                  hj[["doc_id", "cluster"]])


def test_group_star_edges_single_and_multi_key():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "fp": pa.array([10, 10, 20, 20, 20, 30], pa.int64()),
        "lang": pa.array(["en", "de", "en", "en", "de", "de"]),
    }))
    single = group_star_edges(docs, ["fp"]).to_pandas()
    got = sorted(map(tuple, single[["src", "dst"]].to_numpy()))
    assert got == [(2, 1), (4, 3), (5, 3)]  # singleton 6 emits nothing

    multi = group_star_edges(docs, ["fp", "lang"]).to_pandas()
    got = sorted(map(tuple, multi[["src", "dst"]].to_numpy()))
    assert got == [(4, 3)]  # only (20, en) has two members


def test_group_star_edges_feed_components():
    # same-fp relation union same-lang relation merges across relations
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "fp": pa.array([10, 10, 20, 20], pa.int64()),
        "lang": pa.array(["en", "de", "de", "fr"]),
    }))
    edges = group_star_edges(docs, ["fp"]).union(
        group_star_edges(docs, ["lang"]))
    out = dup_clusters(docs, edges, id_a="src", id_b="dst").to_pandas()
    assert out.sort_values("doc_id")["cluster"].tolist() == [1, 1, 1, 1]


def test_dedup_keep_min_keeps_one_per_cluster():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 1, 4, 1_000, 7, 8], pa.int64())}))
    pairs = pa.table({"id_a": pa.array([3, 4, 7], pa.int64()),
                      "id_b": pa.array([1, 3, 8], pa.int64())})
    kept = sorted(dedup_keep_min(docs, pairs).to_pandas()["doc_id"])
    # {1,3,4} -> keep 1; {7,8} -> keep 7; 1000 singleton survives
    assert kept == [1, 7, 1000]


def test_dedup_keep_min_large_dropset_anti_join_path():
    """Past broadcast_max_drop the drop set must NOT gather to the
    driver: the partitioned anti-join path returns the same survivors."""
    ids = np.arange(200, dtype=np.int64)
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(4)
    # chain 0-1, 2-3, ... -> 50 clusters of 2 among the first 100 ids,
    # drop set = 50 ids (the odd ones)
    pairs = pa.table({"id_a": pa.array(ids[0:100:2]),
                      "id_b": pa.array(ids[1:100:2])})
    broad = sorted(dedup_keep_min(docs, pairs).to_pandas()["doc_id"])
    joined = sorted(dedup_keep_min(docs, pairs, broadcast_max_drop=5)
                    .to_pandas()["doc_id"])
    assert joined == broad
    assert joined == sorted(set(ids) - set(ids[1:100:2]))


def test_group_star_edges_ignores_null_keys():
    # null keys define no equivalence: previously transform('min') on
    # NaN-keyed rows produced INT64_MIN garbage edges linking every
    # null-keyed doc into one bogus cluster
    import pandas as pd
    import ray.data as rd

    from simplecrawler_ray.functions.graph import group_star_edges

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "fp": [100.0, 100.0, None, None]})
    edges = (group_star_edges(rd.from_pandas(df), ["fp"])
             .to_pandas().sort_values("src").reset_index(drop=True))
    assert edges.values.tolist() == [[2, 1]]
