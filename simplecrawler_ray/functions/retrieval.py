"""Keyword retrieval over a document corpus: BM25 scoring + top-k.

Scale shape (100 TB corpus):

1. ONE tokenize pass over the text produces a narrow per-doc term-
   frequency table (id, dl, tf_0..tf_{T-1} — (T+2) ints/doc, ~1000x
   smaller than the text), which is materialized so the text is never
   re-read.
2. Corpus stats (N, sum_dl, per-term document frequencies) reduce via
   one-row-per-block partials gathered to the driver — bytes, not rows.
3. Scoring is a stateless vectorized ``map_batches`` over the tf table
   with the (tiny) idf vector baked into the closure; global top-k is
   per-block top-k + a k*n_blocks driver merge (ops.topk pattern).

The tokenizer is lower-cased ASCII letter runs (``[a-z]+`` on
``text.lower()``) so a DuckDB oracle reproduces scores exactly
(see __ray_entry__.oracle_sql q_docs_bm25).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..ops import gather_tables

_WORD_RE = re.compile(r"[a-z]+")


def _tf_table_udf(terms: list[str], id_col: str, text_col: str):
    """Per-batch tokenize -> (id, dl, tf_<term>...) narrow int table."""

    def udf(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        dl = np.zeros(len(texts), dtype=np.int64)
        tf = np.zeros((len(terms), len(texts)), dtype=np.int64)
        pos = {t: i for i, t in enumerate(terms)}
        for r, text in enumerate(texts):
            if not text:
                continue
            toks = _WORD_RE.findall(text.lower())
            dl[r] = len(toks)
            for tok in toks:
                j = pos.get(tok)
                if j is not None:
                    tf[j, r] += 1
        cols = {id_col: batch.column(id_col), "dl": pa.array(dl)}
        for j, t in enumerate(terms):
            cols[f"tf_{j}"] = pa.array(tf[j])
        return pa.table(cols)

    return udf


def bm25_topk(ds: rd.Dataset, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              decimals: int = 6) -> pa.Table:
    """Top-k documents by BM25 score for a bag of query ``terms``.

    Returns an Arrow table (id_col, bm25) sorted by (bm25 desc, id);
    only docs matching at least one term are candidates.  Uses the
    idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive).  Two passes over the NARROW tf table, one over the
    text (reference: the corpus-analysis role of simplecrawler's
    fetchcomplete consumers, README.md:214-260 — scoring fetched
    bodies; the reference itself has no retrieval operator).
    """
    # multiset query semantics: a repeated query term weights its
    # contribution by its query-side count (qtf) — the tf table itself
    # needs each distinct term only once
    lowered = [t.lower() for t in terms]
    terms = list(dict.fromkeys(lowered))
    qtf = np.array([lowered.count(t) for t in terms], dtype=np.float64)
    tf_ds = ds.map_batches(_tf_table_udf(terms, id_col, text_col),
                           batch_format="pyarrow").materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        out = {"n": [batch.num_rows],
               "sum_dl": [int(np.sum(batch.column("dl").to_numpy()))]}
        for j in range(len(terms)):
            out[f"df_{j}"] = [int(np.count_nonzero(
                batch.column(f"tf_{j}").to_numpy()))]
        return pa.table(out)

    parts = gather_tables(tf_ds.map_batches(stats_partial,
                                            batch_format="pyarrow"))
    n = 0
    if parts:
        stats = pa.concat_tables(parts, promote_options="default")
        n = int(np.sum(stats.column("n").to_numpy()))
    if n == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "bm25": pa.array([], pa.float64())})
    sum_dl = int(np.sum(stats.column("sum_dl").to_numpy()))
    avgdl = sum_dl / n
    df = np.array([int(np.sum(stats.column(f"df_{j}").to_numpy()))
                   for j in range(len(terms))], dtype=np.float64)
    idf = np.log1p((n - df + 0.5) / (df + 0.5))

    def score_topk(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy().astype(np.float64)
        denom_dl = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        any_tf = np.zeros(len(dl), dtype=bool)
        for j in range(len(terms)):
            tf = batch.column(f"tf_{j}").to_numpy().astype(np.float64)
            score += qtf[j] * idf[j] * tf * (k1 + 1.0) / (tf + denom_dl)
            any_tf |= tf > 0
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[any_tf]
        score = np.round(score[any_tf], decimals)
        order = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "bm25": pa.array(score[order])})

    tables = gather_tables(tf_ds.map_batches(score_topk,
                                             batch_format="pyarrow"))
    if not tables:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "bm25": pa.array([], pa.float64())})
    merged = pa.concat_tables(tables, promote_options="default")
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    score = merged.column("bm25").to_numpy()
    order = np.lexsort((ids, -score))[:k]
    return pa.table({id_col: pa.array(ids[order]),
                     "bm25": pa.array(score[order])})
