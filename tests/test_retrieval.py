"""BM25 retrieval operator vs a DuckDB oracle on synthetic docs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from simplecrawler_ray.functions.retrieval import bm25_topk

_VOCAB = ["data", "model", "the", "pipeline", "ray", "crawl", "of",
          "training", "corpus", "batch", "Zebra", "Mixed-Case"]


def _docs(n=400, seed=3):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(_VOCAB, rng.integers(0, 40)))
             for _ in range(n)]
    texts[7] = ""  # empty doc
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _oracle(df, terms, k, k1=1.2, b=0.75):
    tf_cols = ",\n".join(
        f"len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), "
        f"x -> x = '{t.lower()}')) AS tf{j}" for j, t in enumerate(terms))
    df_cols = ",\n".join(
        f"sum(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS df{j}"
        for j in range(len(terms)))
    score = " + ".join(
        f"LN(1 + (n - df{j} + 0.5)/(df{j} + 0.5)) * tf{j} * ({k1}+1) / "
        f"(tf{j} + {k1}*(1 - {b} + {b}*dl/avgdl))"
        for j in range(len(terms)))
    any_tf = " + ".join(f"tf{j}" for j in range(len(terms)))
    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(f"""
        WITH tf AS (
          SELECT doc_id,
                 len(regexp_extract_all(lower(text), '[a-z]+')) AS dl,
                 {tf_cols}
          FROM documents
        ), stats AS (
          SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl,
                 {df_cols}
          FROM tf
        )
        SELECT doc_id, ROUND({score}, 6) AS bm25
        FROM tf, stats WHERE {any_tf} > 0
        ORDER BY bm25 DESC, doc_id LIMIT {k}
    """).df().astype({"doc_id": "int64"})


def test_bm25_matches_duckdb():
    df = _docs()
    ds = rd.from_pandas(df).repartition(6)
    got = bm25_topk(ds, ["data", "Model", "the"], k=12).to_pandas()
    want = _oracle(df, ["data", "model", "the"], k=12)
    pd.testing.assert_frame_equal(got, want)


def test_bm25_absent_term_and_small_match_set():
    # one term matches nothing (df=0); the other matches few docs, so
    # fewer than k rows come back
    df = _docs(n=60, seed=11)
    df.loc[5, "text"] = "zebra zebra unique"
    ds = rd.from_pandas(df).repartition(4)
    got = bm25_topk(ds, ["unique", "notinvocab"], k=10).to_pandas()
    want = _oracle(df, ["unique", "notinvocab"], k=10)
    pd.testing.assert_frame_equal(got, want)
    assert (got["doc_id"] == 5).any()


def test_bm25_empty_corpus():
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=str)}))
    out = bm25_topk(ds, ["data"], k=5)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "bm25"]


def test_bm25_repeated_query_term_weights_double(ray_session):
    import ray.data as rd

    from simplecrawler_ray.functions.retrieval import bm25_topk

    docs = rd.from_items([
        {"doc_id": 1, "text": "data systems and data pipelines"},
        {"doc_id": 2, "text": "systems only here"},
    ])
    single = bm25_topk(docs, ["data"], k=2).to_pandas()
    double = bm25_topk(docs, ["data", "data"], k=2).to_pandas()
    # multiset semantics: the repeated term doubles its contribution
    s1 = single.set_index("doc_id")["bm25"]
    s2 = double.set_index("doc_id")["bm25"]
    # scores round to 6 decimals, so compare at that precision
    assert abs(s2[1] - 2 * s1[1]) < 2e-6
