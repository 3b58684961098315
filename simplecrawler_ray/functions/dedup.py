"""Deduplication operators over the ``documents`` table.

Exact + the near-dup family a 100 TB training-data pipeline needs:

* ``exact_dedup``      — content-hash partition + per-group min-id win
  (one shuffle of (hash, id) pairs; text never shuffles).
* ``minhash_lsh_pairs``— shingle -> minhash -> banded LSH buckets ->
  candidate pairs -> Jaccard verify.  The only groupby is on (band,
  band_hash) — the classic web-dedup shape.
* ``SimHasher`` / ``simhash_near_dup_pairs`` — 64-bit simhash column;
  near-dups = small hamming distance (bucketed by rotated prefixes at
  scale, paired via ``hash_near_dup_pairs``).
* ``ngram_jaccard`` / ``ngram_jaccard_sets`` — exact pairwise verify
  for candidate pairs.
* ``embedding_dup_pairs`` — cosine near-dup over an embedding column
  via LSH bucketing (random hyperplanes) then in-bucket matmul.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..ops import groupby_agg

_TOKEN_RE = re.compile(r"\w+")


def _gather_ds(ds) -> list[pa.Table]:
    from ..ops import gather_tables

    return gather_tables(ds)


def _gather(ds, cols) -> list[pa.Table]:
    from ..ops import gather_tables

    return gather_tables(ds.map_batches(lambda b: b.select(cols),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True))


def _stable_hash64(data: "str|bytes") -> int:
    """Process-stable 64-bit hash (Python's builtin hash() is salted per
    process — useless across Ray workers)."""
    import hashlib, struct

    if isinstance(data, str):
        data = data.encode("utf-8")
    return struct.unpack("<q", hashlib.blake2b(data, digest_size=8).digest())[0]


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """blake2b-64 of the exact text bytes."""
    import hashlib, struct

    texts = batch.column(text_col).to_pylist()
    hs = [
        struct.unpack("<q", hashlib.blake2b((t or "").encode(), digest_size=8).digest())[0]
        for t in texts
    ]
    return batch.append_column("content_hash", pa.array(hs, pa.int64()))


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Keep min(id) per distinct text.  Shuffles only (hash, id)."""
    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return groupby_agg(hashed, ["content_hash"], {id_col: ("min", id_col)})


# ---------------------------------------------------------------- minhash

def _shingles(text: str, k: int = 3) -> set[int]:
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        return {_stable_hash64(" ".join(toks))} if toks else set()
    return {_stable_hash64(" ".join(toks[i: i + k])) for i in range(len(toks) - k + 1)}


_MINHASHER_CACHE: dict = {}


def minhasher_udf(batch: pa.Table, *, num_perm: int = 64, seed: int = 42) -> pa.Table:
    """Task UDF with worker-local MinHasher cache (cheaper than spinning
    an actor pool per invocation; see stages/fetch.py rationale)."""
    key = (num_perm, seed)
    h = _MINHASHER_CACHE.get(key)
    if h is None:
        h = MinHasher(num_perm, seed)
        _MINHASHER_CACHE[key] = h
    return h(batch)


class MinHasher:
    """Stateful stage: permutation parameters generated once per worker."""

    def __init__(self, num_perm: int = 64, seed: int = 42, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.prime = np.uint64((1 << 61) - 1)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text or "", self.shingle_k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        vals = np.array(list(sh), dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            # (a*x + b) mod p for each permutation — vectorized (P x S)
            prod = self.a[:, None] * vals[None, :] + self.b[:, None]
            hashed = prod % self.prime
        return hashed.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if not texts:   # Ray can emit empty blocks — np.stack([]) raises
            return batch.append_column(
                "minhash", pa.array([], pa.list_(pa.uint64())))
        sigs = np.stack([self.signature(t) for t in texts])
        return batch.append_column(
            "minhash", pa.array(list(sigs.astype(np.uint64)), pa.list_(pa.uint64()))
        )


def minhash_lsh_pairs(ds: rd.Dataset, num_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.7, id_col: str = "doc_id",
                      seed: int = 42, verify: bool = True,
                      small_threshold: int = 50_000) -> pa.Table:
    """Near-dup pairs via banded LSH.  Returns (id_a, id_b, jaccard),
    id_a < id_b, exact shingle-Jaccard verified.

    Shuffle discipline: band rows are THIN (id, band, band_hash) — the
    64-element signatures never shuffle (16x row duplication of the sig
    otherwise).  Candidate pairs from the bucket groupby are verified
    against a broadcast of the doc texts; at corpus sizes beyond
    broadcast capacity swap the verify stage for a hash-join of
    signatures by id.
    """
    rows_per_band = num_perm // bands

    from ..ops import gather_tables

    # small-corpus fast path: below ~50k docs the five dataset
    # executions of the distributed path cost more than the work —
    # gather once, hash/bucket/verify in one distributed signature pass
    # + driver bucketing.  The distributed path below is the shape that
    # holds at 10^9 docs.
    n_docs = ds.count()
    if n_docs <= small_threshold:
        sig_tables = gather_tables(ds.map_batches(
            minhasher_udf, fn_kwargs=dict(num_perm=num_perm, seed=seed),
            batch_format="pyarrow", batch_size=512, zero_copy_batch=True))
        if not sig_tables:      # empty corpus (gather drops 0-row blocks)
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        t = pa.concat_tables(sig_tables, promote_options="default")
        ids = t.column(id_col).to_pylist()
        texts = t.column("text").to_pylist()
        sigs = t.column("minhash").to_pylist()
        buckets: dict = {}
        sentinel = np.iinfo(np.uint64).max
        for i, sig in zip(ids, sigs):
            s = np.asarray(sig, dtype=np.uint64)
            if s[0] == sentinel and (s == sentinel).all():
                continue  # shingle-less doc — see to_bands
            for b in range(bands):
                key = (b, _stable_hash64(s[b * rows_per_band:(b + 1) * rows_per_band].tobytes()))
                buckets.setdefault(key, []).append(i)
        cand_set = set()
        for members in buckets.values():
            if len(members) < 2:
                continue
            ms = sorted(set(members))
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    cand_set.add((ms[x], ms[y]))
        text_of = dict(zip(ids, texts))
        sh_cache: dict = {}

        def sh(i):
            if i not in sh_cache:
                sh_cache[i] = _shingles(text_of.get(i, ""), 3)
            return sh_cache[i]

        rows = []
        for a, b in sorted(cand_set):
            j = ngram_jaccard_sets(sh(a), sh(b)) if verify else float("nan")
            if not verify or j >= jaccard_threshold:
                rows.append((a, b, j))
        return pa.table({
            "id_a": pa.array([r[0] for r in rows], pa.int64()),
            "id_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        })

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column("minhash").to_pylist()
        out_id, out_band, out_bh = [], [], []
        sentinel = np.iinfo(np.uint64).max
        for i, sig in zip(ids, sigs):
            s = np.asarray(sig, dtype=np.uint64)
            if s[0] == sentinel and (s == sentinel).all():
                # shingle-less doc (empty/whitespace/punctuation-only):
                # EVERY such doc shares the all-max sentinel signature —
                # banding them funnels N docs into one bucket (O(N^2)
                # pairs) that all "verify" at jaccard 1.0.  No shingles
                # => no similarity evidence => no candidates.
                continue
            for b in range(bands):
                chunk = s[b * rows_per_band: (b + 1) * rows_per_band]
                out_id.append(i)
                out_band.append(b)
                out_bh.append(_stable_hash64(chunk.tobytes()) & 0x7FFFFFFFFFFFFFFF)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_bh, pa.int64()),
        })

    banded = ds.map_batches(minhasher_udf,
                            fn_kwargs=dict(num_perm=num_perm, seed=seed),
                            batch_format="pyarrow", batch_size=512,
                            zero_copy_batch=True).map_batches(
        to_bands, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    from ..ops import gather_tables

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")
    tables = gather_tables(pairs)
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if not tables:
        return empty
    cand = (pa.concat_tables(tables, promote_options="default").to_pandas()
            .drop_duplicates(subset=["id_a", "id_b"]))
    if not verify:
        cand["jaccard"] = float("nan")
        cand = cand.sort_values(["id_a", "id_b"])
        return pa.Table.from_pandas(cand, preserve_index=False)

    # exact verify with NO full-corpus broadcast (round-1 scale debt):
    # hash-join the candidate pairs against per-doc shingle rows by
    # id_a then id_b — only the candidates' shingle sets co-locate,
    # and the doc texts never leave their source blocks
    from ..ops import hash_join

    shingle_k = 3

    # only docs that appear in a candidate pair need shingling: the id
    # set is driver-side already (<= 2x pair count), so broadcast it and
    # filter each batch BEFORE tokenizing — without this the verify
    # stage re-shingled and materialized the ENTIRE corpus (a second
    # full tokenize pass, ~corpus-text-sized blobs pinned in the object
    # store) only for the hash join to discard all non-candidate rows
    cand_ids_ref = ray.put(np.unique(np.concatenate(
        [cand["id_a"].to_numpy(), cand["id_b"].to_numpy()]).astype(np.int64)))

    def shingle_rows(batch: pa.Table) -> pa.Table:
        # shingle sets ride the join as int64 binary blobs (the native
        # hash join rejects list<> non-key fields)
        wanted = ray.get(cand_ids_ref)
        ids_arr = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        batch = batch.filter(pa.array(np.isin(ids_arr, wanted)))
        ids = batch.column(id_col).to_pylist()
        texts = batch.column("text").to_pylist()
        sets = [np.fromiter(_shingles(t or "", shingle_k), dtype=np.int64).tobytes()
                for t in texts]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "shingles": pa.array(sets, pa.binary())})

    sh_ds = ds.map_batches(
        lambda b: shingle_rows(b.select([id_col, "text"])),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    sh_a = sh_ds.map_batches(
        lambda b: b.rename_columns(["id_a", "sh_a"]),
        batch_format="pyarrow", zero_copy_batch=True)
    sh_b = sh_ds.map_batches(
        lambda b: b.rename_columns(["id_b", "sh_b"]),
        batch_format="pyarrow", zero_copy_batch=True)

    cand_t = pa.Table.from_pandas(cand, preserve_index=False)
    cand_ds = rd.from_arrow(
        [cand_t.slice(o, 4096) for o in range(0, cand_t.num_rows, 4096)])
    joined = hash_join(
        hash_join(cand_ds, sh_a, on="id_a", n_buckets=4,
                  aggregator_num_cpus=0.25),
        sh_b, on="id_b", n_buckets=4, aggregator_num_cpus=0.25)

    def verify_batch(batch: pa.Table) -> pa.Table:
        a_sets = [set(np.frombuffer(x or b"", dtype=np.int64))
                  for x in batch.column("sh_a").to_pylist()]
        b_sets = [set(np.frombuffer(y or b"", dtype=np.int64))
                  for y in batch.column("sh_b").to_pylist()]
        jac = [ngram_jaccard_sets(x, y) for x, y in zip(a_sets, b_sets)]
        out = pa.table({
            "id_a": batch.column("id_a"),
            "id_b": batch.column("id_b"),
            "jaccard": pa.array(jac, pa.float64()),
        })
        return out.filter(pa.compute.greater_equal(out.column("jaccard"),
                                                   jaccard_threshold))

    verified = gather_tables(joined.map_batches(
        verify_batch, batch_format="pyarrow"))
    if not verified:
        return empty
    out = pa.concat_tables(verified, promote_options="default").to_pandas()
    out = out.sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------- simhash

class SimHasher:
    """Stateful stage: a bounded worker-lifetime token->hash cache (the
    hot natural-language vocabulary is tiny vs token counts, so the
    blake2b cost is paid ~once per distinct hot token per worker) and
    fully vectorized bit-vote accumulation.

    The cache is CAPPED: web text carries an unbounded stream of
    unique tokens (hex ids, session tokens, base64 fragments), so an
    uncapped dict grows without limit on a long-lived worker.  Past
    the cap, new tokens hash without caching — hot tokens stay cached,
    cold ones just pay the blake2b each time."""

    CACHE_MAX = 1 << 20     # ~1M entries, tens of MB worst case

    def __init__(self, seed: int = 42):
        self.seed = seed
        self._token_cache: dict[str, int] = {}

    def _hash64(self, token: str) -> int:
        h = self._token_cache.get(token)
        if h is None:
            import hashlib, struct

            h = struct.unpack(
                "<Q", hashlib.blake2b(token.encode(), digest_size=8,
                                      salt=b"simhash_").digest())[0]
            if len(self._token_cache) < self.CACHE_MAX:
                self._token_cache[token] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = np.zeros(len(texts), dtype=np.int64)
        bitcols = np.arange(64, dtype=np.uint64)
        weights = (np.uint64(1) << bitcols).astype(np.uint64)
        for n, t in enumerate(texts):
            toks = set(_TOKEN_RE.findall((t or "").lower()))
            if not toks:
                continue
            hs = np.fromiter((self._hash64(tok) for tok in toks),
                             dtype=np.uint64, count=len(toks))
            bits = ((hs[:, None] >> bitcols[None, :]) & np.uint64(1)).astype(np.int64)
            v = bits.sum(axis=0) * 2 - len(hs)  # per-bit vote
            # array-style cast: wraps the uint64 bit pattern into int64
            # on every numpy version (np.int64(scalar) raises on >=2^63
            # under NumPy 2's strict scalar conversion)
            out[n] = ((v > 0).astype(np.uint64) * weights).sum().astype(np.int64)
        return batch.append_column("simhash", pa.array(out, pa.int64()))


def simhash_near_dup_pairs(ds: rd.Dataset, max_hamming: int = 3,
                           id_col: str = "doc_id", seed: int = 42) -> pa.Table:
    """SimHash near-dup pairs — see ``hash_near_dup_pairs`` (the
    generic 64-bit-hamming pairing; phash image near-dup uses the same
    operator with ``hash_col="phash"``)."""
    return hash_near_dup_pairs(ds, hash_col="simhash",
                               max_hamming=max_hamming, id_col=id_col)


def phash_near_dup_pairs(ds: rd.Dataset, max_hamming: int = 6,
                         id_col: str = "doc_id") -> pa.Table:
    """Image near-dup pairs over a perceptual-hash column (SURVEY §2.7:
    `groupby(phash_bucket)`): same rotated-prefix pigeonhole buckets +
    exact popcount verify as SimHash, over the corpus ``phash`` int64
    column."""
    return hash_near_dup_pairs(ds, hash_col="phash",
                               max_hamming=max_hamming, id_col=id_col)


def hash_near_dup_pairs(ds: rd.Dataset, hash_col: str, max_hamming: int = 3,
                        id_col: str = "doc_id",
                        n_buckets: int = 64) -> pa.Table:
    """Near-dup pairs over any 64-bit hash column via the
    rotated-prefix (pigeonhole) trick: the hash is split into
    ``max_hamming + 1`` chunks — any two hashes within ``max_hamming``
    bits must agree on at least one chunk — so candidates pair up
    within ``(chunk_index, chunk_value)`` groups, verified exactly by
    popcount.  Same shuffle shape as banded minhash-LSH.

    Chunk groups are shuffled into ``n_buckets`` hash buckets (one
    pandas group per bucket, not per chunk value — group-per-key cost
    the round-2 version ~4x); inside a bucket, rows sort by chunk key
    and intra-run pairs are enumerated by the vectorized
    stride-d equality scan (sorted runs: keys[i]==keys[i+d] implies the
    whole run matches).
    """
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks

    def to_chunks(batch: pa.Table) -> pa.Table:
        # drop null hashes FIRST: crawl output leaves hash_col null for
        # rows that never decoded (fetch errors, non-image bodies); a
        # null round-trips as NaN whose uint64 cast is platform-defined
        # garbage, identical per row — every null row would collapse
        # onto one bogus hash and pair quadratically
        batch = batch.filter(pc.is_valid(batch.column(hash_col)))
        sh = batch.column(hash_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        # ids keep their native dtype (int doc ids or string image ids)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(sh)
        mask = np.uint64((1 << chunk_bits) - 1)
        cv = np.concatenate([
            ((sh >> np.uint64(c * chunk_bits)) & mask).astype(np.int64)
            for c in range(n_chunks)
        ])
        # one combined chunk key: (chunk_i << chunk_bits) | chunk_v
        ck = (np.repeat(np.arange(n_chunks, dtype=np.int64), n)
              << np.int64(chunk_bits)) | cv
        return pa.table({
            id_col: pa.array(np.tile(ids, n_chunks)),
            "__h64": pa.array(np.tile(sh.astype(np.int64), n_chunks)),
            "__ck": pa.array(ck),
            "__bucket": pa.array((ck * np.int64(0x9E3779B1)) % n_buckets),
        })

    def in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        id_dtype = group[id_col].dtype
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                              "id_b": pd.Series([], dtype=id_dtype),
                              "hamming": pd.Series([], dtype="int64")})
        g = group.drop_duplicates(subset=["__ck", id_col]).sort_values(
            ["__ck", id_col], kind="stable")
        if len(g) < 2:
            return empty
        keys = g["__ck"].to_numpy()
        ids = g[id_col].to_numpy()
        sh = g["__h64"].to_numpy().astype(np.uint64)
        ia_parts, ib_parts = [], []
        d = 1
        while d < len(keys):
            same = keys[:-d] == keys[d:]
            hits = np.nonzero(same)[0]
            if not len(hits):
                break
            ia_parts.append(hits)
            ib_parts.append(hits + d)
            d += 1
        if not ia_parts:
            return empty
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        x = sh[ia] ^ sh[ib]
        # vectorized popcount via byte-view unpackbits
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                            axis=1).sum(axis=1).astype(np.int64)
        m = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[m]], "id_b": ids[ib[m]],
                             "hamming": ham[m]})

    from ..ops import gather_tables

    pairs = (ds.map_batches(to_chunks, batch_format="pyarrow", zero_copy_batch=True)
             .groupby("__bucket")
             .map_groups(in_bucket, batch_format="pandas"))
    tables = gather_tables(pairs)
    try:
        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types)).get(id_col, pa.int64())
        if not isinstance(id_type, pa.DataType):
            id_type = pa.from_numpy_dtype(id_type)
    except Exception:
        id_type = pa.int64()
    empty = pa.table({"id_a": pa.array([], id_type),
                      "id_b": pa.array([], id_type),
                      "hamming": pa.array([], pa.int64())})
    if not tables:
        return empty
    out = (pa.concat_tables(tables, promote_options="default").to_pandas()
           .drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"]))
    return pa.Table.from_pandas(out, preserve_index=False)


def ngram_jaccard_sets(sa: set, sb: set) -> float:
    # two shingle-less docs carry no similarity evidence — 0.0, not 1.0
    # (1.0 marked e.g. "foo!!!" and "???" as perfect near-dups)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    return ngram_jaccard_sets(_shingles(a, k), _shingles(b, k))


# ------------------------------------------------------------ embeddings

def embedding_dup_pairs(ds: rd.Dataset, threshold: float = 0.95,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        n_planes: int = 8, seed: int = 42,
                        n_tables: int = 1,
                        exact_threshold: int = 20_000) -> pa.Table:
    """Cosine near-dup pairs (id_a < id_b, cos >= threshold).

    Small corpora (<= ``exact_threshold`` rows) use the EXACT path:
    the normalized matrix broadcasts once (n x d floats — tiny next to
    the texts) and each block computes block-vs-all sims; deterministic
    and recall-1.  Larger corpora use random-hyperplane LSH bucketing
    with ``n_tables`` independent plane sets unioned (per-bucket recall
    compounds: miss probability p^n_tables), then exact in-bucket
    cosine — only (bucket, id, vec) rows shuffle.
    """
    n_rows = ds.count()
    if n_rows <= exact_threshold:
        mat_tables = [t.select([id_col, emb_col])
                      for t in _gather(ds, [id_col, emb_col])]
        if not mat_tables:  # empty corpus (gather drops 0-row blocks)
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        allt = pa.concat_tables(mat_tables, promote_options="default")
        ids_all = allt.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # float64: the exact path doubles as the oracle-checked one and
        # must agree with a float64 SQL cosine to 6 decimals
        m = np.stack(allt.column(emb_col).to_pylist()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1
        mn = m / norms
        order = np.argsort(ids_all)
        ids_all, mn = ids_all[order], mn[order]
        mn_ref = ray.put((ids_all, mn))

        def block_pairs(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:   # empty Ray block: np.stack([]) raises
                return pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            aids, amat = ray.get(mn_ref)
            bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            bm = np.stack(batch.column(emb_col).to_pylist()).astype(np.float64)
            bn = np.linalg.norm(bm, axis=1, keepdims=True)
            bn[bn == 0] = 1
            sims = (bm / bn) @ amat.T
            bi, ai = np.nonzero(sims >= threshold)
            keep = bids[bi] < aids[ai]  # id_a < id_b, no self/dup pairs
            return pa.table({
                "id_a": pa.array(bids[bi[keep]], pa.int64()),
                "id_b": pa.array(aids[ai[keep]], pa.int64()),
                "cos": pa.array(sims[bi[keep], ai[keep]].astype(np.float64)),
            })

        parts = _gather_ds(ds.map_batches(block_pairs, batch_format="pyarrow",
                                          zero_copy_batch=True))
        if not parts:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        out = (pa.concat_tables(parts, promote_options="default").to_pandas()
               .sort_values(["id_a", "id_b"]))
        return pa.Table.from_pandas(out, preserve_index=False)

    first = ds.take(1)
    dim = len(first[0][emb_col])
    planes = np.stack([
        np.random.default_rng(seed + t).normal(size=(dim, n_planes))
        for t in range(n_tables)
    ]).astype(np.float32)  # (n_tables, dim, n_planes)
    planes_ref = ray.put(planes)

    powers = 1 << np.arange(n_planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:       # empty Ray block: np.stack([]) raises
            return pa.table({id_col: batch.column(id_col),
                             emb_col: batch.column(emb_col),
                             "bucket": pa.array([], pa.int64())})
        pl = ray.get(planes_ref)  # (n_tables, dim, n_planes)
        embs = np.stack(batch.column(emb_col).to_pylist()).astype(np.float32)
        parts = []
        for t in range(pl.shape[0]):
            bits = (embs @ pl[t]) > 0
            bucket = (bits.dot(powers) + (t << n_planes)).astype(np.int64)
            parts.append(pa.table({
                id_col: batch.column(id_col),
                emb_col: batch.column(emb_col),
                "bucket": pa.array(bucket),
            }))
        return pa.concat_tables(parts)

    def in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            # dtype-pinned empty: pandas-2 concat no longer ignores
            # empty frames when inferring result dtype, and singleton
            # buckets are the COMMON case — an object-dtype empty here
            # destabilizes the whole output schema
            id_dtype = group[id_col].dtype
            return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                                 "id_b": pd.Series([], dtype=id_dtype),
                                 "cos": pd.Series([], dtype="float64")})
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.stack([np.asarray(e, dtype=np.float32) for e in g[emb_col]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1
        mn = m / norms
        sim = mn @ mn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sim[ia, ib] >= threshold
        return pd.DataFrame({
            "id_a": ids[ia[mask]], "id_b": ids[ib[mask]],
            "cos": sim[ia, ib][mask].astype(float),
        })

    from ..ops import gather_tables

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(in_bucket, batch_format="pandas")
    )
    tables = gather_tables(pairs)
    if not tables:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    merged = pa.concat_tables(tables, promote_options="default").to_pandas()
    merged = merged.drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(merged, preserve_index=False)
