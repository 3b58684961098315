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


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: 64-bit FNV-1a rolling hash of the text —
    deterministic content id for exact-dup detection.

    The recurrence ``h = (h ^ byte) * prime`` is sequential per
    document but vectorizes ACROSS documents: all docs advance in
    lockstep one byte position per numpy step (masked once a doc ends),
    so a batch costs max_len vector ops instead of sum(len) Python
    ops — ~50x the per-byte loop.  Output identical to the scalar
    recurrence."""
    texts = batch.column(text_col).to_pylist()
    bufs = [(t or "").encode("utf-8") for t in texts]
    n = len(bufs)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(bufs):
        if b:
            mat[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * _FNV_PRIME
    fps = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    return batch.append_column("fingerprint", pa.array(fps, pa.int64()))
