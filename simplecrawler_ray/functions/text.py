"""Text-analysis operators for large-scale training-data pipelines.

All are vectorized ``map_batches`` UDFs over the ``documents`` table
(doc_id, text, lang, source, n_chars).  Character classes are chosen to
be exactly replicable in DuckDB SQL so the driver's oracle check can
hash-compare results (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_WS_RE = re.compile(r"\s+")
_PUNCT = set(".,;:!?'\"()-")

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (public common-word lists)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "para", "que"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokenization count — matches DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` for non-empty text."""
    texts = batch.column(text_col).to_pylist()
    counts = [len(_WS_RE.split(t.strip())) if t and t.strip() else 0 for t in texts]
    return batch.append_column("n_tokens", pa.array(counts, pa.int64()))


# BPE-ish pre-tokenizer: letter runs / digit runs / other-symbol runs
# (the GPT-2 pattern's shape without \p{} classes, so Python `re` and
# DuckDB RE2 compile the IDENTICAL pattern — oracle-checkable).  The
# whitespace class is spelled out because \s means ASCII whitespace in
# RE2 but Unicode whitespace in Python re.
_BPE_PATTERN = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9 \t\n\f\r]+"
_BPE_RE = re.compile(_BPE_PATTERN)


def token_count_bpe_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Sub-word-style token count via the BPE-ish run regex — matches
    DuckDB ``len(regexp_extract_all(text, _BPE_PATTERN))`` exactly."""
    texts = batch.column(text_col).to_pylist()
    counts = [len(_BPE_RE.findall(t)) if t else 0 for t in texts]
    return batch.append_column("n_bpe_tokens", pa.array(counts, pa.int64()))


_UPPER = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
_DIGIT = frozenset("0123456789")


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring signals, defined in ASCII classes so a DuckDB
    oracle reproduces them exactly (integer counts, no float ratios):

      n_chars_m = length(text)
      n_upper   = count of [A-Z]
      n_digit   = count of [0-9]
    """
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    length = np.zeros(n, np.int64)
    upper = np.zeros(n, np.int64)
    digit = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        length[i] = len(t)
        upper[i] = sum(c in _UPPER for c in t)
        digit[i] = sum(c in _DIGIT for c in t)
    out = batch.append_column("n_chars_m", pa.array(length))
    out = out.append_column("n_upper", pa.array(upper))
    out = out.append_column("n_digit", pa.array(digit))
    return out


class LangId:
    """Stopword-overlap language ID (stateful stage: marker sets and the
    tokenizer regex built once per actor/worker)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.markers = _LANG_MARKERS

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = []
        for t in texts:
            words = set(self.word_re.findall((t or "").lower()[:1000]))
            best, best_score = "unknown", 0
            for lang, marks in self.markers.items():
                score = len(words & marks)
                if score > best_score:
                    best, best_score = lang, score
            langs.append(best if best_score >= 2 else "unknown")
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


# budget for the dense byte matrix one lockstep chunk may allocate
# (rows x padded-length elements).  64 MiB: big enough that typical
# batches run as a single chunk, small enough that one
# max_resource_size (16 MiB) outlier document cannot inflate a
# 512-row batch to rows x 16 MiB (= 8 GiB) of padding.
_FP_CHUNK_ELEMS = 64 << 20
# chunks narrower than this run the scalar per-byte loop instead: the
# lockstep recurrence costs max_len numpy dispatches regardless of
# width, so a 1-row x 16 MiB chunk would pay 16M numpy calls where the
# Python loop over the bytes is ~10x faster.
_FP_MIN_LOCKSTEP_ROWS = 8
_FNV_MASK = (1 << 64) - 1


def _fnv1a_scalar(buf: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in buf:
        h = ((h ^ byte) * 0x100000001B3) & _FNV_MASK
    return h


def fingerprint_md5_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint via md5-low64 (little-endian int of md5
    bytes [8:16], masked to non-negative int64) — same stable-content-id
    contract as the FNV variant, chosen where SQL-oracle parity matters:
    DuckDB's ``md5_number_lower`` computes the identical value."""
    import hashlib

    texts = batch.column(text_col).to_pylist()
    fps = [int.from_bytes(hashlib.md5((t or "").encode("utf-8")).digest()[8:],
                          "little") & 0x7FFFFFFFFFFFFFFF
           for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: 64-bit FNV-1a rolling hash of the text —
    deterministic content id for exact-dup detection.

    The recurrence ``h = (h ^ byte) * prime`` is sequential per
    document but vectorizes ACROSS documents: docs advance in lockstep
    one byte position per numpy step (masked once a doc ends), so a
    batch costs max_len vector ops instead of sum(len) Python ops.
    Rows are grouped by length into chunks whose dense padded matrix
    stays under ``_FP_CHUNK_ELEMS`` (length skew no longer inflates
    memory by batch_size x max_doc_len); outlier-length chunks too thin
    to amortize the lockstep dispatch fall back to the scalar loop.
    Output is identical to the scalar recurrence either way."""
    texts = batch.column(text_col).to_pylist()
    bufs = [(t or "").encode("utf-8") for t in texts]
    n = len(bufs)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    out = np.zeros(n, dtype=np.uint64)
    order = np.argsort(lens, kind="stable")  # group similar lengths
    start = 0
    while start < n:
        end = start + 1
        # grow the chunk while the padded matrix stays under budget
        # (lengths ascend, so the chunk's max len is its last element)
        while end < n and (end - start + 1) * max(int(lens[order[end]]), 1) \
                <= _FP_CHUNK_ELEMS:
            end += 1
        idx = order[start:end]
        start = end
        chunk_max = int(lens[idx[-1]])
        if chunk_max == 0:
            out[idx] = _FNV_OFFSET
            continue
        if len(idx) < _FP_MIN_LOCKSTEP_ROWS:
            for i in idx:
                out[i] = np.uint64(_fnv1a_scalar(bufs[i]))
            continue
        clens = lens[idx]
        mat = np.zeros((len(idx), chunk_max), dtype=np.uint8)
        for r, i in enumerate(idx):
            b = bufs[i]
            if b:
                mat[r, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        h = np.full(len(idx), _FNV_OFFSET, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(chunk_max):
                active = clens > j
                h[active] = ((h[active] ^ mat[active, j].astype(np.uint64))
                             * _FNV_PRIME)
        out[idx] = h
    fps = (out & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))


_NGRAM_TOKEN_RE = re.compile(r"[a-z0-9]+")


def top_ngrams(ds, k: int = 20, n: int = 2, text_col: str = "text"):
    """Corpus-wide top-k word n-grams: the classic word-count shape.

    Per-batch partial: ONE Counter over the whole batch (tokenize with
    an ASCII class identical in Python re and DuckDB RE2), emitted as a
    tiny (ngram, cnt) table — so the shuffle moves per-batch partial
    counts, never tokens.  A grouped sum then a per-block top-k merge
    (``ops.topk``) bound the final gather to k rows per block.
    Ties break (cnt DESC, ngram ASC).  Returns a pa.Table.
    """
    from collections import Counter

    from simplecrawler_ray.ops import groupby_agg, topk

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column(text_col).to_pylist():
            toks = _NGRAM_TOKEN_RE.findall((text or "").lower())
            c.update(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))
        if not c:
            return pa.Table.from_pydict(
                {"ngram": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())})
        return pa.Table.from_pydict(
            {"ngram": list(c.keys()),
             "cnt": pa.array(list(c.values()), pa.int64())})

    summed = groupby_agg(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["ngram"], {"cnt": ("sum", "cnt")})
    return topk(summed, [("cnt", True), ("ngram", False)], k)
