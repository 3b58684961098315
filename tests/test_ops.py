"""Direct unit tests for the generic relational operators (ops.py)
and the multimodal stages — checked against pandas/duckdb locally."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from simplecrawler_ray.ops import (
    broadcast_join,
    distinct,
    groupby_agg,
    topk,
    tumbling_window,
    zip_with_index,
)


@pytest.fixture(scope="module")
def sample_df():
    rng = np.random.default_rng(7)
    n = 5000
    return pd.DataFrame({
        "k": rng.integers(0, 10, n),
        "g": rng.choice(["a", "b", "c"], n),
        "v": rng.normal(100, 20, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 86400 * 3, n), unit="s"),
    })


def test_groupby_agg_matches_pandas(sample_df):
    ds = rd.from_pandas(sample_df).repartition(8)
    out = groupby_agg(ds, ["g"], {
        "total": ("sum", "v"), "n": ("count", "v"),
        "mn": ("min", "v"), "mx": ("max", "v"), "avg": ("mean", "v"),
    }).to_pandas().sort_values("g").reset_index(drop=True)
    exp = sample_df.groupby("g")["v"].agg(
        total="sum", n="count", mn="min", mx="max", avg="mean"
    ).reset_index().sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["g", "total", "n", "mn", "mx", "avg"]], exp, check_dtype=False,
        rtol=1e-9)


def test_broadcast_join(sample_df):
    dim = pd.DataFrame({"k": range(10), "label": [f"L{i}" for i in range(10)]})
    ds = rd.from_pandas(sample_df).repartition(4)
    out = broadcast_join(ds, dim, on="k").to_pandas()
    assert len(out) == len(sample_df)
    assert (out["label"] == "L" + out["k"].astype(str)).all()


def test_topk(sample_df):
    ds = rd.from_pandas(sample_df).repartition(8)
    t = topk(ds, [("v", True), ("k", False)], 7)
    exp = sample_df.sort_values(["v", "k"], ascending=[False, True]).head(7)
    assert t.column("v").to_pylist() == exp["v"].tolist()


def test_distinct(sample_df):
    ds = rd.from_pandas(sample_df).repartition(8)
    out = distinct(ds, ["g", "k"]).to_pandas()
    exp = sample_df[["g", "k"]].drop_duplicates()
    assert len(out) == len(exp)
    assert set(map(tuple, out.values)) == set(map(tuple, exp.values))


def test_zip_with_index(sample_df):
    ds = rd.from_pandas(sample_df.head(1000)).repartition(7)
    out = zip_with_index(ds, col="rid", start=100).to_pandas()
    assert sorted(out["rid"]) == list(range(100, 1100))


def test_tumbling_window(sample_df):
    ds = rd.from_pandas(sample_df).repartition(4)
    out = tumbling_window(ds, "ts", 3600, ["g"], {"n": ("count", "v"),
                                                  "s": ("sum", "v")})
    df = out.to_pandas()
    con = duckdb.connect()
    con.register("t", sample_df)
    exp = con.execute("""
        SELECT g, date_trunc('hour', ts) AS window_start,
               COUNT(*) AS n, SUM(v) AS s
        FROM t GROUP BY 1, 2""").df()
    a = df.sort_values(["g", "window_start"]).reset_index(drop=True)
    b = exp.sort_values(["g", "window_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert a["n"].tolist() == b["n"].tolist()
    np.testing.assert_allclose(a["s"].to_numpy(dtype=float),
                               b["s"].to_numpy(dtype=float), rtol=1e-9)


# --------------------------------------------------------------- multimodal

def test_image_decode_stage():
    from simplecrawler_ray.functions.multimodal import ImageDecodeStage
    from simplecrawler_ray.sources.web import ScaleWeb

    sw = ScaleWeb(n_pages=10, image_side=24)
    rows = [sw.corpus_row(i) for i in range(10)]
    batch = pa.table({
        "image_id": [r["image_id"] for r in rows],
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
    })
    out = ImageDecodeStage()(batch)
    assert out.column("img_w").to_pylist() == [24] * 10
    assert out.column("decode_error").to_pylist() == [""] * 10
    assert out.column("phash_decoded").to_pylist()[0] != 0
    # real-JPEG stub path: reported per row, batch survives
    jbatch = pa.table({"bytes": pa.array([b"\xff\xd8\xff\xe0xxxx"], pa.binary())})
    jout = ImageDecodeStage()(jbatch)
    assert jout.column("decode_error").to_pylist()[0].startswith("stubbed:")


def test_image_resize_stage():
    from simplecrawler_ray.functions.imagecodec import decode_image
    from simplecrawler_ray.functions.multimodal import ImageResizeStage
    from simplecrawler_ray.sources.web import ScaleWeb

    sw = ScaleWeb(n_pages=4, image_side=24)
    batch = pa.table({"bytes": pa.array([sw.corpus_row(i)["bytes"] for i in range(4)], pa.binary())})
    out = ImageResizeStage(side=8)(batch)
    dec = decode_image(out.column("resized_bytes").to_pylist()[0])
    assert dec.shape == (8, 8, 3)


def test_audio_video_stubs_run_in_ray():
    """Stubbed decodes, real plumbing: the stages run as actual Ray Data
    actor-pool stages over a binary column."""
    from simplecrawler_ray.functions.multimodal import (
        AudioFeatureStage,
        VideoFrameSampleStage,
    )

    blobs = [bytes([i]) * 100 for i in range(20)]
    ds = rd.from_arrow(pa.table({"bytes": pa.array(blobs, pa.binary())}))
    out = ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                         batch_size=8, concurrency=2).materialize()
    df = out.to_pandas()
    assert (df["audio_rms"] > 0).all()
    # determinism
    df2 = ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                         batch_size=8, concurrency=2).to_pandas()
    assert df["audio_rms"].tolist() == df2["audio_rms"].tolist()

    vout = ds.map_batches(VideoFrameSampleStage, batch_format="pyarrow",
                          batch_size=8, concurrency=2).to_pandas()
    assert (vout["frame_count"] == 3).all()

    # real_decode on a compressed container -> per-row stub error (the
    # ImageDecodeStage error-column contract), not a batch failure
    out3 = AudioFeatureStage(real_decode=True)(
        pa.table({"bytes": pa.array([b"x"], pa.binary())}))
    assert "stubbed" in out3.column("audio_decode_error").to_pylist()[0]
def test_minhash_small_and_distributed_paths_agree(tmp_path):
    import ray.data as rd
    import pyarrow.parquet as pq

    from simplecrawler_ray.functions.dedup import minhash_lsh_pairs

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    small = minhash_lsh_pairs(ds, jaccard_threshold=0.5).to_pandas()
    dist = minhash_lsh_pairs(ds, jaccard_threshold=0.5,
                             small_threshold=0).to_pandas()
    assert small[["id_a", "id_b"]].values.tolist() == dist[["id_a", "id_b"]].values.tolist()


def test_hash_join_matches_pandas(sample_df):
    from simplecrawler_ray.ops import hash_join

    left = sample_df[["k", "v"]].copy()
    right = pd.DataFrame({"k": list(range(8)) * 2,
                          "w": np.arange(16) * 1.5})
    lds = rd.from_pandas(left).repartition(6)
    rds = rd.from_pandas(right).repartition(3)
    out = hash_join(lds, rds, on="k", n_buckets=4).to_pandas()
    exp = left.merge(right, on="k", how="inner")
    assert len(out) == len(exp)
    assert out["v"].sum() == pytest.approx(exp["v"].sum())
    assert out["w"].sum() == pytest.approx(exp["w"].sum())


def test_asof_join():
    from simplecrawler_ray.ops import asof_join

    left = pd.DataFrame({
        "key": ["a", "a", "b", "b"],
        "ts": pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:20",
                              "2024-01-01 10:07", "2024-01-01 09:00"]),
    })
    right = pd.DataFrame({
        "key": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:10",
                              "2024-01-01 10:00"]),
        "px": [1.0, 2.0, 9.0],
    })
    out = asof_join(rd.from_pandas(left), right, key="key", ts_col="ts").to_pandas()
    got = dict(zip(zip(out["key"], out["ts"].astype(str)), out["px"]))
    assert got[("a", "2024-01-01 10:05:00")] == 1.0
    assert got[("a", "2024-01-01 10:20:00")] == 2.0
    assert got[("b", "2024-01-01 10:07:00")] == 9.0
    assert np.isnan(got[("b", "2024-01-01 09:00:00")])


def test_groupby_agg_exact_decimal_sums():
    """Fixed-point sums are exact and independent of block/batch order
    (round-1 hash-mismatch root cause)."""
    import random

    import ray.data as rd

    from simplecrawler_ray.ops import groupby_agg

    rng = random.Random(7)
    rows = [{"k": f"g{i % 3}", "v": round(rng.uniform(100, 100000), 2)}
            for i in range(5000)]
    expected = {}
    for r in rows:
        expected.setdefault(r["k"], 0)
        expected[r["k"]] += round(r["v"] * 100)

    def run(order):
        t = pa.table({"k": [r["k"] for r in order], "v": [r["v"] for r in order]})
        chunks = [t.slice(o, 700) for o in range(0, t.num_rows, 700)]
        ds = rd.from_arrow(chunks)
        out = groupby_agg(ds, ["k"], {"s": ("sum", "v", 2)}).to_pandas()
        return dict(zip(out["k"], out["s"]))

    a = run(rows)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    b = run(shuffled)
    for k, cents in expected.items():
        exact = cents / 100  # correctly-rounded double of the exact rational
        assert a[k] == exact and b[k] == exact


def test_ivf_matches_bruteforce_topk():
    """IVF with nprobe=n_lists is exhaustive -> must equal brute force;
    the inverted lists live in the object store, not on the driver."""
    import ray.data as rd

    from simplecrawler_ray.functions.ann import IvfIndex, knn_bruteforce

    rng = __import__("numpy").random.default_rng(3)
    import numpy as np

    n, d = 2000, 16
    vecs = rng.normal(size=(n, d)).astype("float32")
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs])})
    ds = rd.from_arrow([t.slice(o, 256) for o in range(0, n, 256)])
    q = vecs[7]
    brute = knn_bruteforce(ds, q, k=10).to_pandas()
    idx = IvfIndex(n_lists=8).fit(ds)
    assert not idx.__dict__.get("_partitions")  # no driver-resident vectors
    ivf = idx.search(q, k=10, nprobe=8)
    assert list(ivf["vec_id"]) == list(brute["vec_id"])
    np.testing.assert_allclose(ivf["cos"], brute["cos"], atol=1e-5)


def test_simhash_near_dup_pairs():
    import ray.data as rd

    from simplecrawler_ray.functions.dedup import SimHasher, simhash_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base,
             base,  # exact dup -> hamming 0
             base.replace("dog", "cat"),  # near dup
             "completely different content about ray data pipelines",
             "yet another unrelated document with its own words entirely"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow([t.slice(i, 1) for i in range(len(texts))])
    hashed = ds.map_batches(SimHasher(), batch_format="pyarrow")
    pairs = simhash_near_dup_pairs(hashed, max_hamming=16).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got  # exact dup
    ham = dict(zip(zip(pairs["id_a"], pairs["id_b"]), pairs["hamming"]))
    assert ham[(0, 1)] == 0
    assert (3, 4) not in got or ham[(3, 4)] > 0  # unrelated not at 0


def test_embedding_dup_pairs_exact_and_lsh_agree():
    """Planted near-dup vectors: the exact small-corpus path finds them
    with recall 1; the LSH path (forced via exact_threshold=0) finds
    them too with enough tables; results agree on the planted pairs."""
    import numpy as np
    import ray.data as rd

    from simplecrawler_ray.functions.dedup import embedding_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=(50, 32)).astype("float32")
    # plant: vec 50 ~ vec 0, vec 51 ~ vec 1
    planted = np.vstack([base, base[0] + rng.normal(scale=0.01, size=32),
                         base[1] + rng.normal(scale=0.01, size=32)]).astype("float32")
    t = pa.table({"vec_id": pa.array(range(len(planted)), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in planted])})
    ds = rd.from_arrow([t.slice(o, 16) for o in range(0, len(planted), 16)])

    exact = embedding_dup_pairs(ds, threshold=0.99).to_pandas()
    got = set(zip(exact["id_a"], exact["id_b"]))
    assert (0, 50) in got and (1, 51) in got

    lsh = embedding_dup_pairs(ds, threshold=0.99, exact_threshold=0,
                              n_planes=4, n_tables=8).to_pandas()
    got_lsh = set(zip(lsh["id_a"], lsh["id_b"]))
    assert (0, 50) in got_lsh and (1, 51) in got_lsh
    assert got_lsh <= got  # LSH never invents pairs the exact path lacks


def test_pack_sequences_invariants():
    """Packing: every doc appears exactly once, no pack over max_tokens
    (except single oversized docs), deterministic across runs/blocking."""
    import ray.data as rd

    from simplecrawler_ray.functions.packing import pack_sequences

    rng = __import__("numpy").random.default_rng(5)
    n = 500
    toks = rng.integers(10, 400, n)
    toks[7] = 900  # oversized doc -> own pack
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "n_tokens": pa.array(toks, pa.int64())})

    def run(block_size):
        ds = rd.from_arrow([t.slice(o, block_size) for o in range(0, n, block_size)])
        out = pack_sequences(ds, max_tokens=512, n_partitions=8).to_pandas()
        return out.sort_values(["partition", "pack_index"]).reset_index(drop=True)

    a = run(100)
    b = run(37)  # different block boundaries -> identical packing
    assert a[["partition", "pack_index", "n_docs", "total_tokens"]].equals(
        b[["partition", "pack_index", "n_docs", "total_tokens"]])
    all_ids = [i for ids in a["doc_ids"] for i in ids]
    assert sorted(all_ids) == list(range(n))
    over = a[a["total_tokens"] > 512]
    assert (over["n_docs"] == 1).all()  # only oversized singletons exceed


def test_add_split_column_stability():
    import ray.data as rd

    from simplecrawler_ray.functions.packing import add_split_column

    t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    ds = rd.from_arrow([t.slice(o, 256) for o in range(0, 2000, 256)])
    a = add_split_column(ds, val_frac=0.2, test_frac=0.1).to_pandas()
    # re-sharded input -> identical per-doc split
    ds2 = rd.from_arrow([t.slice(o, 73) for o in range(0, 2000, 73)])
    b = add_split_column(ds2, val_frac=0.2, test_frac=0.1).to_pandas()
    am = dict(zip(a["doc_id"], a["split"]))
    bm = dict(zip(b["doc_id"], b["split"]))
    assert am == bm
    frac_val = (a["split"] == "val").mean()
    assert 0.15 < frac_val < 0.25  # close to requested 0.2
    assert set(a["split"]) == {"train", "val", "test"}


def test_knn_multi_matches_single():
    import numpy as np
    import ray.data as rd

    from simplecrawler_ray.functions.ann import knn_bruteforce, knn_bruteforce_multi

    rng = np.random.default_rng(9)
    n, d = 800, 24
    vecs = rng.normal(size=(n, d)).astype("float64")
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs])})
    ds = rd.from_arrow([t.slice(o, 128) for o in range(0, n, 128)])
    multi = knn_bruteforce_multi(ds, vecs[:3], k=5).to_pandas()
    for qid in range(3):
        single = knn_bruteforce(ds, vecs[qid], k=5).to_pandas()
        part = multi[multi["query_id"] == qid]
        assert list(part["vec_id"]) == list(single["vec_id"])
        np.testing.assert_allclose(part["cos"].to_numpy(), single["cos"].to_numpy())


def test_training_pipeline_end_to_end():
    """dedup -> quality -> split -> pack over a corpus with planted
    duplicates and junk rows: counts drop at the right stages and every
    surviving train doc lands in exactly one pack."""
    import ray.data as rd

    from simplecrawler_ray.pipelines.traindata import run_training_pipeline

    texts = []
    for i in range(200):
        texts.append(f"document number {i} with some words repeated words "
                     f"and unique token u{i} " * 3)
    texts[10] = texts[0]          # exact dup -> dropped
    texts[11] = texts[1]          # exact dup -> dropped
    texts[12] = "1 2 3"           # too short + digits -> dropped
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow([t.slice(o, 32) for o in range(0, 200, 32)])
    out = run_training_pipeline(ds, max_tokens=256)
    assert out["n_input"] == 200
    assert out["n_after_dedup"] == 198          # two dups removed
    assert out["n_after_quality"] == 197        # junk row removed
    assert out["n_train"] + out["n_val"] + out["n_test"] == 197
    assert out["n_packs"] >= 1
    assert 0 < out["mean_pack_fill"] <= 1.0


def test_training_pipeline_near_dup_collapses_clusters():
    """near_dup=True: a cluster of near-identical docs (small token
    edits, so NOT exact dups) collapses to its min-id representative
    via minhash pairs -> connected components -> keep-min."""
    import ray.data as rd

    from simplecrawler_ray.pipelines.traindata import run_training_pipeline

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight " * 4)
    texts = []
    for i in range(60):
        if i < 5:   # near-dup cluster: one token differs per member
            texts.append(base + f"variant{i}")
        else:
            texts.append(f"totally distinct document {i} with its own "
                         f"unique vocabulary item u{i} words " * 3)
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow([t.slice(o, 16) for o in range(0, 60, 16)])
    out = run_training_pipeline(ds, max_tokens=256, near_dup=True,
                                jaccard_threshold=0.7)
    assert out["n_after_dedup"] == 60           # no exact dups
    assert out["n_near_dup_dropped"] == 4       # cluster of 5 -> 1 row
    assert out["n_after_quality"] == 56

    baseline = run_training_pipeline(ds, max_tokens=256)
    assert baseline["n_near_dup_dropped"] == 0
    assert baseline["n_after_quality"] == 60


def test_asof_join_partitioned_matches_broadcast():
    """Two-large-sides as-of (round-2 verdict #7): hash-shuffle both
    sides by key + per-group merge_asof must equal the broadcast
    operator, with a right side spread over multiple blocks."""
    from simplecrawler_ray.ops import asof_join, asof_join_partitioned

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "key": rng.choice(list("abcdefgh"), n_l),
        "ts": rng.integers(0, 10_000, n_l).astype("int64"),
        "lv": np.arange(n_l),
    })
    right = pd.DataFrame({
        "key": rng.choice(list("abcdefgh"), n_r),
        "ts": rng.integers(0, 10_000, n_r).astype("int64"),
        "px": rng.random(n_r),
    })
    # multi-block right side
    right_ds = rd.from_pandas([right.iloc[i::4].reset_index(drop=True)
                               for i in range(4)])
    got = asof_join_partitioned(
        rd.from_pandas(left), right_ds, key="key", ts_col="ts").to_pandas()
    exp = asof_join(rd.from_pandas(left), right, key="key",
                    ts_col="ts").to_pandas()
    got = got.sort_values(["key", "ts", "lv"]).reset_index(drop=True)
    exp = exp.sort_values(["key", "ts", "lv"]).reset_index(drop=True)
    assert len(got) == len(exp) == n_l
    pd.testing.assert_series_equal(
        got["px"].reset_index(drop=True), exp["px"].reset_index(drop=True),
        check_names=False)


def test_fingerprint_chunked_matches_scalar():
    """Length-skewed batches (one huge doc among tiny ones) must hash
    identically to the scalar recurrence without a dense n x max_len
    allocation (ADVICE round-2: memory blowup)."""
    import pyarrow as pa

    from simplecrawler_ray.functions import text as text_mod
    from simplecrawler_ray.functions.text import _fnv1a_scalar, fingerprint_batch

    texts = ["", "a", "short doc", "x" * 100_000] + [f"doc {i}" for i in range(50)]
    batch = pa.table({"text": pa.array(texts, pa.string())})
    out = fingerprint_batch(batch)
    got = out.column("fingerprint").to_pylist()
    exp = [(_fnv1a_scalar(t.encode()) & 0x7FFFFFFFFFFFFFFF) for t in texts]
    assert got == exp
    # tiny chunk budget forces multi-chunk path; results identical
    old = text_mod._FP_CHUNK_ELEMS
    try:
        text_mod._FP_CHUNK_ELEMS = 1 << 10
        got2 = fingerprint_batch(batch).column("fingerprint").to_pylist()
    finally:
        text_mod._FP_CHUNK_ELEMS = old
    assert got2 == exp


def test_phash_near_dup_pairs_matches_bruteforce():
    """Image near-dup over the corpus phash column (string ids): the
    pigeonhole-bucketed operator must return EXACTLY the all-pairs
    popcount reference (the chunk trick guarantees recall 1 within
    max_hamming)."""
    from simplecrawler_ray.functions.dedup import phash_near_dup_pairs
    from simplecrawler_ray.sources.web import ScaleWeb

    sw = ScaleWeb(n_pages=120, n_hosts=4, image_side=24)
    rows = [sw.corpus_row(i) for i in range(120)]
    ids = [r["image_id"] for r in rows]
    ph = np.array([r["phash"] for r in rows], dtype=np.int64).astype(np.uint64)
    t = pa.table({"image_id": pa.array(ids, pa.string()),
                  "phash": pa.array([r["phash"] for r in rows], pa.int64())})
    ds = rd.from_arrow([t.slice(o, 30) for o in range(0, 120, 30)])
    K = 16  # min pairwise distance in this corpus is 16 -> non-vacuous
    got = phash_near_dup_pairs(ds, max_hamming=K, id_col="image_id").to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))

    ia, ib = np.triu_indices(len(ids), k=1)
    x = ph[ia] ^ ph[ib]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
    exp_pairs = {tuple(sorted((ids[a], ids[b])))
                 for a, b, h in zip(ia, ib, ham) if h <= K}
    assert exp_pairs, "corpus should contain near-dup phash pairs"
    assert got_pairs == exp_pairs
    assert (got["hamming"] <= K).all()


def test_hash_near_dup_pairs_random_bruteforce_trials():
    """Randomized check of the generic pairing operator: for random
    64-bit hashes (with planted near-dups) the result must equal the
    all-pairs popcount reference for several (n, K) shapes."""
    from simplecrawler_ray.functions.dedup import hash_near_dup_pairs

    rng = np.random.default_rng(11)
    for n, K in [(300, 3), (200, 6), (150, 10)]:
        base = rng.integers(1, 2**63, n, dtype=np.uint64)
        # plant near-dups: flip <=K random bits of some rows
        for i in range(0, n, 7):
            j = (i + 3) % n
            flips = rng.integers(0, 64, rng.integers(0, K + 1))
            v = base[i]
            for b in flips:
                v ^= np.uint64(1) << np.uint64(b)
            base[j] = v
        ids = np.arange(n, dtype=np.int64)
        t = pa.table({"doc_id": pa.array(ids), "h": pa.array(base.astype(np.int64))})
        ds = rd.from_arrow([t.slice(o, 64) for o in range(0, n, 64)])
        got = hash_near_dup_pairs(ds, hash_col="h", max_hamming=K).to_pandas()
        got_pairs = set(zip(got["id_a"], got["id_b"]))
        ia, ib = np.triu_indices(n, k=1)
        x = base[ia] ^ base[ib]
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        exp = {(int(ids[a]), int(ids[b]))
               for a, b, h in zip(ia, ib, ham) if h <= K}
        assert got_pairs == exp, (n, K, len(got_pairs), len(exp))


def test_asof_join_partitioned_salted_hot_key():
    """Hot-key salting (round-3 verdict #5): with one key holding ~50%
    of the left rows, salt={hot: 4} splits it into 4 sub-buckets with
    the right timeline duplicated — results identical to unsalted."""
    from simplecrawler_ray.ops import asof_join_partitioned

    rng = np.random.default_rng(21)
    n_l, n_r = 2000, 600
    hot_keys = np.where(rng.random(n_l) < 0.5, "HOT",
                        rng.choice(list("abcdef"), n_l))
    left = pd.DataFrame({
        "key": hot_keys,
        "ts": rng.integers(0, 50_000, n_l).astype("int64"),
        "lv": np.arange(n_l),
    })
    right = pd.DataFrame({
        "key": np.where(rng.random(n_r) < 0.5, "HOT",
                        rng.choice(list("abcdef"), n_r)),
        "ts": rng.integers(0, 50_000, n_r).astype("int64"),
        "px": rng.random(n_r),
    })
    right_ds = rd.from_pandas([right.iloc[i::3].reset_index(drop=True)
                               for i in range(3)])
    plain = asof_join_partitioned(
        rd.from_pandas(left), right_ds, key="key", ts_col="ts").to_pandas()
    salted = asof_join_partitioned(
        rd.from_pandas(left), right_ds, key="key", ts_col="ts",
        salt={"HOT": 4}).to_pandas()
    plain = plain.sort_values(["key", "ts", "lv"]).reset_index(drop=True)
    salted = salted.sort_values(["key", "ts", "lv"]).reset_index(drop=True)
    assert len(salted) == len(plain) == n_l
    pd.testing.assert_frame_equal(salted, plain, check_like=True)


def test_sessionize_matches_duckdb():
    from simplecrawler_ray.ops import sessionize

    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 120, n),
        "ts": pd.to_datetime("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 86400 * 2, n), unit="s"),
    })
    ds = rd.from_pandas(df).repartition(7)
    got = (sessionize(ds, "user_id", "ts", gap_s=1800, tiebreak="event_id")
           .to_pandas().sort_values(["user_id", "session_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), y AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM x
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events, min(ts) AS session_start,
               max(ts) AS session_end
        FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id
    """).df().astype({"user_id": "int64", "n_events": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_sessionize_gap_is_strict():
    from simplecrawler_ray.ops import sessionize

    ts0 = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [7, 7, 7],
        # exactly 1800 s then 1801 s gaps: first stays, second splits
        "ts": [ts0, ts0 + pd.Timedelta(seconds=1800),
               ts0 + pd.Timedelta(seconds=1800 + 1801)],
    })
    out = (sessionize(rd.from_pandas(df), "user_id", "ts", gap_s=1800,
                      tiebreak="event_id")
           .to_pandas().sort_values("session_id").reset_index(drop=True))
    assert out["session_id"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [2, 1]


def test_grouped_topk_matches_pandas(sample_df):
    from simplecrawler_ray.ops import grouped_topk

    df = sample_df.assign(rid=np.arange(len(sample_df), dtype=np.int64))
    ds = rd.from_pandas(df).repartition(9)
    got = (grouped_topk(ds, ["k"], "v", k=3, tiebreak="rid")
           .to_pandas().sort_values(["k", "v", "rid"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    want = (df.sort_values(["k", "v", "rid"], ascending=[True, False, True],
                           kind="stable")
              .groupby("k", sort=False).head(3)
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_grouped_topk_ties_and_ascending():
    from simplecrawler_ray.ops import grouped_topk

    df = pd.DataFrame({"g": [1, 1, 1, 2, 2],
                       "v": [5.0, 5.0, 5.0, 1.0, 2.0],
                       "rid": [10, 11, 12, 13, 14]})
    got = (grouped_topk(rd.from_pandas(df).repartition(3), ["g"], "v", k=2,
                        descending=False, tiebreak="rid")
           .to_pandas().sort_values(["g", "v", "rid"])
           .reset_index(drop=True))
    assert got[["g", "rid"]].values.tolist() == [[1, 10], [1, 11],
                                                 [2, 13], [2, 14]]


def test_lag_delta_matches_duckdb(sample_df):
    from simplecrawler_ray.ops import lag_delta
    df = sample_df.assign(rid=np.arange(len(sample_df)),
                          ts_us=sample_df["ts"].astype("int64"))
    ds = rd.from_pandas(df).repartition(8)
    out = (lag_delta(ds, "k", ["ts", "rid"], "ts_us", ["rid", "k"],
                     out_col="gap_us")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT rid, k, ts_us - LAG(ts_us) OVER
            (PARTITION BY k ORDER BY ts, rid) AS gap_us
        FROM t ORDER BY rid""").df()
    pd.testing.assert_frame_equal(
        out.astype({"gap_us": "float64"}),
        exp.astype({"gap_us": "float64"}), check_dtype=False)


def test_cumsum_by_key_matches_duckdb(sample_df):
    from simplecrawler_ray.ops import cumsum_by_key
    df = sample_df.assign(rid=np.arange(len(sample_df)),
                          cents=np.rint(sample_df["v"] * 100).astype("int64"))
    ds = rd.from_pandas(df).repartition(8)
    out = (cumsum_by_key(ds, "g", ["ts", "rid"], "cents", ["rid", "g"],
                         out_col="run")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT rid, g, SUM(cents) OVER
            (PARTITION BY g ORDER BY ts, rid) AS run
        FROM t ORDER BY rid""").df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_semi_anti_join_matches_pandas(sample_df):
    from simplecrawler_ray.ops import anti_join, semi_join
    left = sample_df.assign(rid=np.arange(len(sample_df)))
    right = pd.DataFrame({"key": [0, 1, 2, 3, 4]})
    lds = rd.from_pandas(left).repartition(8)
    rds = rd.from_pandas(right).repartition(3)
    got_a = (anti_join(lds, rds, "k", right_on="key")
             .to_pandas().sort_values("rid").reset_index(drop=True))
    exp_a = left[~left["k"].isin(right["key"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(got_a, exp_a, check_dtype=False)
    got_s = (semi_join(lds, rds, "k", right_on="key")
             .to_pandas().sort_values("rid").reset_index(drop=True))
    exp_s = left[left["k"].isin(right["key"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)
    # int columns survive the padded union without float widening
    assert got_a["k"].dtype == left["k"].dtype


def test_anti_join_empty_result_keeps_schema(sample_df):
    from simplecrawler_ray.ops import anti_join
    left = sample_df.head(100).reset_index(drop=True)
    right = pd.DataFrame({"key": left["k"].unique()})
    got = anti_join(rd.from_pandas(left).repartition(4),
                    rd.from_pandas(right), "k", right_on="key").to_pandas()
    assert len(got) == 0


def test_pivot_counts_matches_duckdb(sample_df):
    from simplecrawler_ray.ops import pivot_counts
    ds = rd.from_pandas(sample_df).repartition(8)
    out = (pivot_counts(ds, "k", "g", ["a", "b", "c"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", sample_df)
    exp = con.execute("""
        SELECT k,
               count(*) FILTER (g = 'a') AS n_a,
               count(*) FILTER (g = 'b') AS n_b,
               count(*) FILTER (g = 'c') AS n_c
        FROM t GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_pivot_counts_missing_value_is_zero():
    from simplecrawler_ray.ops import pivot_counts
    df = pd.DataFrame({"k": [1, 1, 2], "g": ["a", "a", "b"]})
    out = (pivot_counts(rd.from_pandas(df), "k", "g", ["a", "b", "z"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["n_z"].tolist() == [0, 0]
    assert out["n_a"].tolist() == [2, 0]


def test_grouped_percentile_disc_matches_duckdb(sample_df):
    from simplecrawler_ray.ops import grouped_percentile_disc
    ds = rd.from_pandas(sample_df).repartition(8)
    got = grouped_percentile_disc(ds, "g", "v", [0.1, 0.5, 0.99]).to_pandas()
    con = duckdb.connect()
    con.register("t", sample_df)
    parts = " UNION ALL ".join(
        f"SELECT g, {p} AS p, quantile_disc(v, {p}) AS v "
        f"FROM t GROUP BY g" for p in [0.1, 0.5, 0.99])
    exp = con.execute(f"SELECT * FROM ({parts}) ORDER BY g, p").df()
    pd.testing.assert_frame_equal(got.astype({"p": "float64"}),
                                  exp.astype({"p": "float64"}),
                                  check_dtype=False)


def test_grouped_percentile_disc_exact_edges():
    # p=1.0 is the max; p→0 picks the first element (index ceil(p*n)-1)
    from simplecrawler_ray.ops import grouped_percentile_disc
    df = pd.DataFrame({"g": ["x"] * 4, "v": [10.0, 20.0, 30.0, 40.0]})
    got = grouped_percentile_disc(rd.from_pandas(df), "g", "v",
                                  [0.01, 0.5, 1.0]).to_pandas()
    assert got["v"].tolist() == [10.0, 20.0, 40.0]


def test_top_ngrams_matches_bruteforce():
    from collections import Counter
    from simplecrawler_ray.functions.text import top_ngrams
    rng = np.random.default_rng(5)
    vocab = ["cat", "dog", "sat", "mat", "ran", "the", "a"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(400)] + ["", "  ", "!!!"]
    got = top_ngrams(rd.from_items([{"text": t} for t in texts])
                     .repartition(8), k=10, n=2).to_pandas()
    c = Counter()
    for t in texts:
        toks = t.lower().split()
        c.update(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["ngram"], got["cnt"])) == exp


def test_grouped_percentile_disc_ignores_nulls():
    from simplecrawler_ray.ops import grouped_percentile_disc
    df = pd.DataFrame({"g": ["x"] * 6,
                       "v": [10.0, None, 20.0, None, 30.0, 40.0]})
    got = grouped_percentile_disc(rd.from_pandas(df), "g", "v",
                                  [0.5, 1.0]).to_pandas()
    # nulls excluded -> n=4; quantile_disc(0.5)=20, (1.0)=40
    assert got["v"].tolist() == [20.0, 40.0]


def test_range_join_broadcast_matches_duckdb(sample_df):
    from simplecrawler_ray.ops import range_join_broadcast
    bins = pd.DataFrame({"lo": [0.0, 80.0, 110.0],
                         "hi": [80.0, 110.0, 140.0],
                         "tier": ["low", "mid", "high"]})
    df = sample_df.assign(rid=np.arange(len(sample_df)))
    ds = rd.from_pandas(df).repartition(8)
    got = (range_join_broadcast(ds, "v", bins)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    con.register("bins", bins)
    exp = con.execute("""
        SELECT t.*, b.tier FROM t JOIN bins b
        ON t.v >= b.lo AND t.v < b.hi ORDER BY rid""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_broadcast_left_nulls():
    from simplecrawler_ray.ops import range_join_broadcast
    bins = pd.DataFrame({"lo": [0.0], "hi": [10.0], "tier": ["in"]})
    df = pd.DataFrame({"v": [-5.0, 5.0, 15.0]})
    got = (range_join_broadcast(rd.from_pandas(df), "v", bins, how="left")
           .to_pandas())
    assert got["tier"].tolist() == [None, "in", None]


def test_range_join_broadcast_rejects_overlap():
    from simplecrawler_ray.ops import range_join_broadcast
    bins = pd.DataFrame({"lo": [0.0, 5.0], "hi": [6.0, 10.0],
                         "tier": ["a", "b"]})
    df = pd.DataFrame({"v": [1.0]})
    import pytest as _pytest
    with _pytest.raises(ValueError):
        range_join_broadcast(rd.from_pandas(df), "v", bins)


def test_new_ops_layout_independent():
    """Results must not depend on block layout (the distributed
    invariant): every new operator gives identical output at 2 vs 13
    partitions over randomized frames."""
    from simplecrawler_ray.ops import (anti_join, cumsum_by_key,
                                       grouped_percentile_disc, lag_delta,
                                       pivot_counts, range_join_broadcast)

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = 2000
        df = pd.DataFrame({
            "k": rng.integers(0, 20, n),
            "g": rng.choice(["a", "b", "c", "d"], n),
            "v": rng.normal(50, 30, n).round(2),
            "rid": np.arange(n),
        })
        right = pd.DataFrame({"key": rng.integers(0, 20, 7)})
        bins = pd.DataFrame({"lo": [-1e9, 0.0, 50.0],
                             "hi": [0.0, 50.0, 1e9],
                             "tier": ["neg", "lo", "hi"]})

        def run(parts):
            ds = rd.from_pandas(df).repartition(parts)
            rds = rd.from_pandas(right).repartition(min(parts, 3))
            return {
                "lag": lag_delta(ds, "k", ["v", "rid"], "rid",
                                 ["rid", "k"], out_col="d")
                       .to_pandas().sort_values("rid").reset_index(drop=True),
                "cum": cumsum_by_key(ds, "g", ["v", "rid"], "rid",
                                     ["rid"], out_col="c")
                       .to_pandas().sort_values("rid").reset_index(drop=True),
                "anti": anti_join(ds, rds, "k", right_on="key")
                        .to_pandas().sort_values("rid").reset_index(drop=True),
                "pivot": pivot_counts(ds, "k", "g", ["a", "b", "c", "d"])
                         .to_pandas().sort_values("k").reset_index(drop=True),
                "pctl": grouped_percentile_disc(ds, "g", "v",
                                                [0.3, 0.77]).to_pandas(),
                "range": range_join_broadcast(ds, "v", bins)
                         .to_pandas().sort_values("rid").reset_index(drop=True),
            }

        a, b = run(2), run(13)
        for name in a:
            pd.testing.assert_frame_equal(a[name], b[name],
                                          check_dtype=False), name


def test_sample_fraction_deterministic_and_unbiased():
    from simplecrawler_ray.functions.packing import sample_fraction
    df = pd.DataFrame({"doc_id": np.arange(20_000), "x": 1})
    a = (sample_fraction(rd.from_pandas(df).repartition(4), 0.3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (sample_fraction(rd.from_pandas(df.iloc[::-1]).repartition(11), 0.3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)          # layout/order independent
    assert abs(len(a) / len(df) - 0.3) < 0.02    # close to the fraction
    # different seed -> a different (deterministic) subset
    c = sample_fraction(rd.from_pandas(df), 0.3, seed=1).to_pandas()
    assert set(c["doc_id"]) != set(a["doc_id"])


def test_joins_preserve_full_range_int64():
    """64-bit hash-like values survive the padded union exactly — the
    float64 widening round-trip silently corrupted values past 2^53."""
    from simplecrawler_ray.ops import anti_join, asof_join_partitioned
    big = np.array([(1 << 60) + 12345, (1 << 62) + 7, 3, -(1 << 61) - 9],
                   dtype=np.int64)
    left = pd.DataFrame({"k": [1, 2, 3, 4], "h": big})
    right = pd.DataFrame({"key": [2, 4]})
    got = (anti_join(rd.from_pandas(left), rd.from_pandas(right),
                     "k", right_on="key")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["h"].tolist() == [big[0], big[2]]

    l = pd.DataFrame({"k": ["a", "a", "b"], "ts": [5, 9, 5],
                      "lh": big[:3]})
    r = pd.DataFrame({"k": ["a", "b"], "ts": [1, 1], "rh": big[1:3]})
    out = (asof_join_partitioned(rd.from_pandas(l), rd.from_pandas(r),
                                 "k", "ts")
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    assert out["lh"].tolist() == [int(big[0]), int(big[1]), int(big[2])]
    assert out["rh"].tolist() == [int(big[1]), int(big[1]), int(big[2])]


def test_resolve_buckets_scales_with_rows():
    """n_buckets=None derives bucket count from input size, so one
    bucket's pandas frame stays bounded at any scale; an explicit int
    passes through untouched (and skips the materialize)."""
    from simplecrawler_ray.ops import _resolve_buckets
    small = rd.range(100)
    _, nb = _resolve_buckets(small, None, target=1000)
    assert nb == 32                                  # floor
    _, nb = _resolve_buckets(rd.range(250_000), None, target=1000)
    assert nb == 250                                 # ceil(rows/target)
    same, nb = _resolve_buckets(small, 7, target=1)
    assert nb == 7 and same is small                 # explicit passthrough


def test_joins_preserve_nulls_in_int64_payloads():
    """A genuine NULL in a 64-bit int payload column must come back as
    NA, not INT64_MIN (the binary stash used to encode nulls via a
    float64-NaN astype)."""
    from simplecrawler_ray.ops import asof_join_partitioned, semi_join
    big = (1 << 60) + 12345
    lt = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                   "h": pa.array([big, None, 7], pa.int64())})
    rt = pa.table({"key": pa.array([1, 2], pa.int64())})
    got = (semi_join(rd.from_arrow(lt), rd.from_arrow(rt),
                     "k", right_on="key")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["h"][0] == big and pd.isna(got["h"][1])

    l = pa.table({"k": pa.array(["a", "a"]), "ts": pa.array([5, 9]),
                  "lh": pa.array([None, big], pa.int64())})
    r = pa.table({"k": pa.array(["a"]), "ts": pa.array([1]),
                  "rh": pa.array([None], pa.int64())})
    out = (asof_join_partitioned(rd.from_arrow(l), rd.from_arrow(r),
                                 "k", "ts")
           .to_pandas().sort_values("ts").reset_index(drop=True))
    assert pd.isna(out["lh"][0]) and out["lh"][1] == big
    assert pd.isna(out["rh"]).all()


def test_asof_join_partitioned_pandas_blocks_and_null_ts():
    """pandas-format input blocks (numpy dtypes in ds.schema()) and
    null left timestamps must not crash the partitioned as-of join."""
    from simplecrawler_ray.ops import asof_join_partitioned
    l = pd.DataFrame({"k": [1, 1, 2], "ts": [10.0, None, 10.0],
                      "v": [1, 2, 3]})
    r = pd.DataFrame({"k": [1, 2], "ts": [5.0, 50.0], "rv": [7, 8]})
    out = (asof_join_partitioned(rd.from_pandas(l), rd.from_pandas(r),
                                 "k", "ts")
           .to_pandas().sort_values("k").reset_index(drop=True))
    # the null-ts row is dropped (SQL NULL never satisfies the
    # inequality); k=2 has no earlier right row -> NA rv
    assert out["v"].tolist() == [1, 3]
    assert out["rv"][0] == 7 and pd.isna(out["rv"][1])


def test_groupby_agg_count_ignores_nulls():
    from simplecrawler_ray.ops import groupby_agg
    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [1.0, None, 2.0]})
    out = (groupby_agg(rd.from_pandas(df), ["g"], {"n": ("count", "v")})
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert out["n"].tolist() == [1, 1]


def test_minhash_skips_shingleless_docs(ray_session):
    from simplecrawler_ray.functions.dedup import minhash_lsh_pairs
    docs = rd.from_items(
        [{"doc_id": i, "text": "!!!"} for i in range(30)]
        + [{"doc_id": 100, "text": "the same long sentence appears here"},
           {"doc_id": 101, "text": "the same long sentence appears here"}])
    pairs = minhash_lsh_pairs(docs, verify=True).to_pandas()
    # empty-shingle docs pair with nothing; the real dup pair survives
    assert pairs[["id_a", "id_b"]].values.tolist() == [[100, 101]]


def test_dedup_operators_handle_empty_and_null_inputs():
    """Empty corpora and null hash columns must not crash or fabricate
    pairs: gather_tables drops zero-row blocks (so concat of [] was
    reachable), and crawl output leaves phash null for undecoded rows
    (NaN->uint64 is platform garbage, identical per row — null rows
    would otherwise all pair with each other)."""
    import pyarrow as pa
    import ray.data as rd

    from simplecrawler_ray.functions.dedup import (
        embedding_dup_pairs,
        hash_near_dup_pairs,
        minhash_lsh_pairs,
    )

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert minhash_lsh_pairs(empty_docs).num_rows == 0

    empty_vecs = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    assert embedding_dup_pairs(empty_vecs).num_rows == 0

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "h": pa.array([None, None, None, 7], pa.int64())})
    pairs = hash_near_dup_pairs(rd.from_arrow(t), hash_col="h",
                                id_col="doc_id", n_buckets=4)
    assert pairs.num_rows == 0
