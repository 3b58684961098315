"""Generic Ray-Data-first relational operators.

These are the engine's reusable wide-operation building blocks, written
the way they must be written at 100 TB:

* ``groupby_agg``   — partial aggregation inside ``map_batches`` (one
  row per key per batch) before the shuffle, so the all-to-all exchange
  moves pre-combined partials, not raw rows.
* ``broadcast_join``— small side ``ray.put`` once, pandas merge per
  batch inside ``map_batches``; no shuffle.
* ``topk``          — per-batch local top-k, then a tiny driver merge;
  the full sort never happens.
* ``distinct``      — hash-based groupby first-wins.
* ``zip_with_index``— deterministic global row ids from per-block
  offsets (block metadata only; no extra data pass).
* ``tumbling_window``— event-time bucketing + grouped aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


_AGG_FUNCS = {"sum", "count", "min", "max", "mean"}


def gather_tables(ds: rd.Dataset) -> list[pa.Table]:
    """Driver-side gather of a dataset's blocks as Arrow tables.

    ALWAYS materialize before to_arrow_refs: on Ray 2.49 calling
    ``to_arrow_refs()`` on a lazy Dataset executes the plan TWICE
    (observed; side effects + cost double).  Materialize pins blocks,
    then the refs come for free.
    """
    md = ds.materialize()
    out = []
    for r in md.to_arrow_refs():
        t = ray.get(r)
        # Ray 2.49's to_arrow_refs passes pandas blocks through unconverted
        # (e.g. untouched empty blocks downstream of a pandas map_groups)
        if isinstance(t, pd.DataFrame):
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows:
            out.append(t)
    return out


def groupby_agg(ds: rd.Dataset, keys: list[str], aggs: dict[str, tuple],
                batch_format: str = "pyarrow") -> rd.Dataset:
    """Grouped aggregation with per-batch partial combine.

    ``aggs``: output_name -> (func, input_col[, decimals]); func in
    sum/count/min/max/mean.  mean is computed as sum+count partials and
    finalized after the shuffle, so partials stay mergeable.

    When ``decimals`` is given for a sum/mean over a fixed-point float
    column (e.g. money stored as doubles, exact at d decimal places),
    values are scaled to int64 at 10**decimals and accumulated EXACTLY,
    so the result is independent of batch/accumulation order and equals
    a DECIMAL-exact SQL oracle bit-for-bit (the final value is the
    correctly-rounded double of the exact rational sum/10**d).  Without
    it, float sums pick up order-dependent last-digit noise — the
    round-1 hash-mismatch root cause.  int64 partials overflow at
    ~9.2e18 * 10**-d absolute sum; fine for money at any realistic SF.
    """
    specs: dict[str, tuple] = {}
    for name, spec in aggs.items():
        fn, col = spec[0], spec[1]
        dec = spec[2] if len(spec) > 2 else None
        if fn not in _AGG_FUNCS:
            raise ValueError(f"unsupported agg {fn}")
        specs[name] = (fn, col, dec)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        for name, (fn, col, dec) in specs.items():
            if dec is not None and fn in ("sum", "mean"):
                sc = np.rint(df[col].to_numpy(dtype=np.float64) * 10.0 ** dec)
                # nulls contribute 0 to the sum (pandas skipna parity;
                # mean divides by the non-null count)
                df[f"__x_{name}"] = np.where(np.isnan(sc), 0.0, sc).astype(np.int64)
        g = df.groupby(keys, sort=False, dropna=False)
        out = {}
        for name, (fn, col, dec) in specs.items():
            scaled = dec is not None and fn in ("sum", "mean")
            src = f"__x_{name}" if scaled else col
            if fn == "count":
                # COUNT(col) = non-null count (SQL semantics; matches the
                # mean path); COUNT(*) = pass col=None
                out[f"__{name}_cnt"] = (g[col].count() if col
                                        else g[keys[0]].size())
            elif fn == "mean":
                out[f"__{name}_sum"] = g[src].sum()
                out[f"__{name}_cnt"] = g[col].count()
            elif fn == "sum":
                out[f"__{name}_sum"] = g[src].sum()
            else:
                out[f"__{name}_{fn}"] = getattr(g[col], fn)()
        pdf = pd.DataFrame(out).reset_index()
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        res = {k: [group[k].iloc[0]] for k in keys}
        for name, (fn, col, dec) in specs.items():
            if fn == "count":
                res[name] = [group[f"__{name}_cnt"].sum()]
            elif fn == "mean":
                cnt = group[f"__{name}_cnt"].sum()
                if not cnt:
                    res[name] = [float("nan")]
                elif dec is not None:
                    s = int(group[f"__{name}_sum"].sum())
                    # exact-int / power-of-ten, THEN / count: mirrors the
                    # oracle's CAST(SUM(DECIMAL) AS DOUBLE) / COUNT(col)
                    res[name] = [(s / 10 ** dec) / cnt]
                else:
                    res[name] = [group[f"__{name}_sum"].sum() / cnt]
            elif fn == "sum":
                if dec is not None:
                    s = int(group[f"__{name}_sum"].sum())
                    res[name] = [s / 10 ** dec]
                else:
                    res[name] = [group[f"__{name}_sum"].sum()]
            elif fn == "min":
                res[name] = [group[f"__{name}_min"].min()]
            elif fn == "max":
                res[name] = [group[f"__{name}_max"].max()]
        return pd.DataFrame(res)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(keys).map_groups(final, batch_format="pandas")


def broadcast_join(ds: rd.Dataset, small: "pd.DataFrame|pa.Table", on: "str|list[str]",
                   how: str = "inner", suffix: str = "_r") -> rd.Dataset:
    """Join against a broadcast small side (dimension table)."""
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    small_ref = ray.put(small)

    def join_batch(batch: pa.Table) -> pa.Table:
        sm = ray.get(small_ref)
        df = batch.to_pandas()
        out = df.merge(sm, on=on, how=how, suffixes=("", suffix))
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)


_JOIN_TYPES = {"inner": "inner", "left": "left_outer",
               "right": "right_outer", "outer": "full_outer",
               "semi": "left_semi", "anti": "left_anti"}


def hash_join(left: rd.Dataset, right: rd.Dataset, on: "str|list[str]",
              n_buckets: int = 32, how: str = "inner",
              suffix: str = "_r",
              aggregator_num_cpus: "float | None" = None) -> rd.Dataset:
    """Partitioned hash join for two LARGE sides, via Ray Data's native
    hash-shuffle join operator: both sides are hash-partitioned into
    ``n_buckets`` and each bucket is joined worker-side.  No driver
    materialization and no broadcast anywhere (the round-1 version
    gathered the whole right side driver-side — OOM at scale).

    Use ``broadcast_join`` when one side fits in memory.  A single
    bucket (both sides) must fit an aggregator — raise ``n_buckets``
    for bigger inputs or hot keys.  Right-side columns colliding with
    left-side names get ``suffix``.
    """
    keys = tuple([on] if isinstance(on, str) else on)
    # fractional aggregator CPUs: aggregators reserving >= the session's
    # CPU count starve the upstream map/read tasks -> deadlock (e.g.
    # 8 x 0.5 on a 4-CPU pytest session).  Derive the per-aggregator
    # reservation from the ACTUAL session size so n_buckets aggregators
    # collectively reserve at most half the CPUs on any session (the
    # reservation only gates scheduling, not real parallelism once
    # tasks are running).
    if aggregator_num_cpus is None:
        try:
            cpus = float(ray.cluster_resources().get("CPU", 4.0))
        except Exception:
            cpus = 4.0
        aggregator_num_cpus = min(0.2, max(0.01, (cpus * 0.5) / n_buckets))
    return left.join(right, _JOIN_TYPES[how], n_buckets, on=keys,
                     right_suffix=suffix,
                     aggregator_ray_remote_args={"num_cpus": aggregator_num_cpus})


def asof_join(left: rd.Dataset, right_small: "pd.DataFrame", key: str,
              ts_col: str, direction: str = "backward") -> rd.Dataset:
    """As-of join: for each left row, the latest right row at or before
    its timestamp (per key).  Right side broadcast; per-batch
    ``pd.merge_asof`` (ray_guide pattern).  Assumes the right side is
    sortable in memory; bucket both sides by key for two large sides.
    """
    right_sorted = right_small.sort_values(ts_col)
    right_ref = ray.put(right_sorted)

    def join_batch(batch: pa.Table) -> pa.Table:
        r = ray.get(right_ref)
        df = batch.to_pandas().sort_values(ts_col)
        out = pd.merge_asof(df, r, on=ts_col, by=key, direction=direction)
        return pa.Table.from_pandas(out, preserve_index=False)

    return left.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)


def asof_join_partitioned(left: rd.Dataset, right: rd.Dataset, key: str,
                          ts_col: str, direction: str = "backward",
                          suffix: str = "_r",
                          n_buckets: int = 32,
                          salt: "dict | None" = None) -> rd.Dataset:
    """As-of join for two LARGE sides: both sides hash-shuffle by
    key BUCKET (one exchange into ``n_buckets`` groups), then each
    bucket runs one local ``pd.merge_asof(..., by=key)`` worker-side.
    No broadcast, no driver materialization — use this when the right
    side doesn't fit one node; ``asof_join`` (broadcast) is cheaper
    for dimension-sized right sides.

    Bucketing (not group-per-key) keeps the group count at
    ``n_buckets`` — per-key groups were ~6x slower at 100k keys (one
    tiny pandas frame per key).  Partitioning assumption: all rows of
    one bucket fit one worker; raise ``n_buckets`` for bigger inputs.

    ``salt``: ``{key_value: k}`` for skew-heavy keys (Zipf head): a
    salted key's LEFT rows split into ``k`` dedicated sub-buckets (by
    timestamp hash) and its RIGHT rows are duplicated into each, so
    the hot key's group shrinks ~k× while every left row still sees
    the key's full right timeline — results are identical to the
    unsalted join (mirrors the crawl politeness host-salting;
    round-3 verdict #5).  Derive it from per-key counts past a
    threshold.  Right value columns colliding with left names get
    ``suffix``.
    """
    salt = {k_: max(1, int(v)) for k_, v in (salt or {}).items()}
    salt_offsets: dict = {}
    off = n_buckets
    for k_, kk in salt.items():
        salt_offsets[k_] = off
        off += kk
    lschema, rschema = left.schema(), right.schema()
    lnames, rnames = lschema.names, rschema.names
    ltypes = dict(zip(lnames, lschema.types))
    rtypes = dict(zip(rnames, rschema.types))
    rvals = [c for c in rnames if c not in (key, ts_col)]
    rmap = {c: (c + suffix if c in lnames else c) for c in rvals}
    lvals = [c for c in lnames if c not in (key, ts_col)]
    out_cols = [key, ts_col] + lvals + [rmap[c] for c in rvals]

    def _is_int(t) -> bool:
        # ds.schema() yields pyarrow types for Arrow blocks but numpy
        # dtypes for pandas blocks — accept either
        try:
            if isinstance(t, pa.DataType):
                return pa.types.is_integer(t)
            return np.issubdtype(t, np.integer)
        except Exception:
            return False

    def _np_of(t):
        at = _arrow_type(t)
        return np.dtype("uint64") if pa.types.is_unsigned_integer(at) \
            else np.dtype("int64")

    # 64-bit int VALUE columns ride through the padded union as 8-byte
    # binary: the other side's null padding would widen them to float64
    # in the pandas group frames, silently corrupting values past 2^53
    # (this repo's own content/sim hashes).  key/ts are non-null on
    # both sides, so they never widen and stay native.
    lbin = {c: _np_of(ltypes[c]) for c in lvals if _is_int(ltypes[c])}
    rbin = {rmap[c]: _np_of(rtypes[c]) for c in rvals if _is_int(rtypes[c])}

    def _base_buckets(batch: pa.Table) -> np.ndarray:
        # deterministic cross-process key hash (stable pandas hash)
        kb = pd.util.hash_pandas_object(
            batch.column(key).to_pandas(), index=False).to_numpy()
        return (kb % n_buckets).astype(np.int64)

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key), ts_col: batch.column(ts_col)}
        for c in lvals:
            cols[c] = (_ints_to_bin(batch.column(c), lbin[c])
                       if c in lbin else batch.column(c))
        for c in rvals:
            cols[rmap[c]] = pa.nulls(
                batch.num_rows,
                pa.binary(8) if rmap[c] in rbin else _arrow_type(rtypes[c]))
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.int8))
        bucket = _base_buckets(batch)
        if salt:
            keys_pd = batch.column(key).to_pandas()
            hot = keys_pd.isin(salt).to_numpy()
            if hot.any():
                # sub-bucket a hot key's left rows by timestamp hash
                tsh = pd.util.hash_pandas_object(
                    batch.column(ts_col).to_pandas(), index=False).to_numpy()
                for kv, kk in salt.items():
                    m = (keys_pd == kv).to_numpy()
                    bucket[m] = salt_offsets[kv] + (tsh[m] % kk)
        cols["__bucket"] = pa.array(bucket)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key), ts_col: batch.column(ts_col)}
        for c in lvals:
            cols[c] = pa.nulls(
                batch.num_rows,
                pa.binary(8) if c in lbin else _arrow_type(ltypes[c]))
        for c in rvals:
            cols[rmap[c]] = (_ints_to_bin(batch.column(c), rbin[rmap[c]])
                             if rmap[c] in rbin else batch.column(c))
        cols["__side"] = pa.array(np.ones(batch.num_rows, np.int8))
        t = pa.table(cols)
        bucket = _base_buckets(batch)
        if not salt:
            return t.append_column("__bucket", pa.array(bucket))
        keys_pd = batch.column(key).to_pandas()
        hot = keys_pd.isin(salt).to_numpy()
        parts = [t.filter(pa.array(~hot)).append_column(
            "__bucket", pa.array(bucket[~hot]))]
        # a hot key's right rows are duplicated into each of its k
        # sub-buckets so every left sub-bucket sees the full timeline
        for kv, kk in salt.items():
            sub = t.filter(pa.array((keys_pd == kv).to_numpy()))
            for j in range(kk):
                parts.append(sub.append_column("__bucket", pa.array(
                    np.full(sub.num_rows, salt_offsets[kv] + j, np.int64))))
        return pa.concat_tables([p for p in parts if p.num_rows],
                                promote_options="default")

    tagged = left.map_batches(tag_left, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        right.map_batches(tag_right, batch_format="pyarrow",
                          zero_copy_batch=True))

    rcols_out = [rmap[c] for c in rvals]
    lint_kt = [c for c in (key, ts_col) if _is_int(ltypes[c])]

    def merge_group(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0]
        # a null key/ts can never satisfy the as-of inequality (SQL
        # NULL semantics) — and merge_asof would raise on it
        l = l.dropna(subset=[key, ts_col])
        if not len(l):
            return pd.DataFrame({c: pd.Series([], dtype=group[c].dtype)
                                 for c in out_cols})
        l = l.drop(columns=["__side", "__bucket"] + rcols_out).sort_values(
            ts_col, kind="stable")
        for c in lint_kt:
            l[c] = l[c].astype("int64")
        for c, dt in lbin.items():  # decode stashed left int values
            l[c] = pd.array(_bin_to_ints(l[c], dt),
                            dtype="UInt64" if dt.kind == "u" else "Int64")
        r = group[group["__side"] == 1]
        r = r[[key, ts_col] + rcols_out].sort_values(ts_col, kind="stable")
        for c in lint_kt:
            r[c] = r[c].astype("int64")
        for c, dt in rbin.items():  # decode right ints to NULLABLE ints:
            # unmatched left rows get pd.NA after the merge, never NaN
            r[c] = pd.array(_bin_to_ints(r[c], dt),
                            dtype="UInt64" if dt.kind == "u" else "Int64")
        out = pd.merge_asof(l, r, on=ts_col, by=key, direction=direction)
        return out[out_cols]

    return tagged.groupby("__bucket").map_groups(merge_group,
                                                 batch_format="pandas")


def topk(ds: rd.Dataset, sort_cols: list[tuple[str, bool]], k: int) -> pa.Table:
    """Global top-k: per-block local top-k -> tiny driver merge.

    ``sort_cols``: [(col, descending)], ties broken by later entries.
    """
    keys = [(c, "descending" if d else "ascending") for c, d in sort_cols]

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=keys)
        return batch.take(idx[:k])

    parts = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    tables = gather_tables(parts)
    if not tables:
        # empty input: a typed empty table (None broke callers far away)
        try:
            return _arrow_schema_of(ds).empty_table()
        except Exception:
            return None
    merged = pa.concat_tables(tables, promote_options="default")
    idx = pc.sort_indices(merged, sort_keys=keys)
    return merged.take(idx[:k])


def distinct(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """DISTINCT over cols: per-batch dedup partial, then grouped first-wins."""
    def local(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(cols)
        .map_groups(first, batch_format="pandas")
    )


def zip_with_index(ds: rd.Dataset, col: str = "row_id", start: int = 0) -> rd.Dataset:
    """Deterministic global row index from per-block row counts.

    Reads only block metadata for the offsets (no data pass); each block
    then stamps ``start + offset + local_index`` in parallel.
    """
    ds = ds.materialize()
    bundles = list(ds.iter_internal_ref_bundles())
    counts = []
    for b in bundles:
        for _, meta in b.blocks:
            counts.append(meta.num_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) + start

    @ray.remote
    def stamp(block, off):
        # blocks may be pyarrow Tables or pandas DataFrames
        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        arr = pa.array(np.arange(off, off + block.num_rows, dtype=np.int64))
        return block.append_column(col, arr)

    out_refs = []
    i = 0
    for b in bundles:
        for block_ref, _ in b.blocks:
            out_refs.append(stamp.remote(block_ref, int(offsets[i])))
            i += 1
    return rd.from_arrow_refs(out_refs)


def tumbling_window(ds: rd.Dataset, ts_col: str, size_s: int, keys: list[str],
                    aggs: dict[str, tuple[str, str]]) -> rd.Dataset:
    """Event-time tumbling window: bucket ts to window start, grouped agg.

    Ray Data has no watermarks (batch engine); window assignment is a
    pure column transform, then ``groupby_agg`` handles partial+final.
    """
    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        win = pc.floor_temporal(ts, multiple=size_s, unit="second")
        return batch.append_column("window_start", win)

    bucketed = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    return groupby_agg(bucketed, keys + ["window_start"], aggs)


def sessionize(ds: rd.Dataset, key_col: str, ts_col: str, gap_s: int = 1800,
               tiebreak: "str|None" = None,
               n_buckets: "int|None" = None) -> rd.Dataset:
    """Gap-based sessionization: one output row per (key, session).

    A new session starts when the gap to the key's previous event is
    strictly greater than ``gap_s`` seconds.  Returns
    (key, session_id starting at 1 per key, n_events, session_start,
    session_end).

    Scale shape: keys hash into ``n_buckets`` groups (ONE shuffle);
    each bucket sessionizes its whole frame VECTORIZED across all its
    keys (sort + shift + cumsum), so millions of tiny per-key groups
    never become millions of pandas frames.  Data-dependent windows
    need the key's full timeline co-located — unlike
    ``tumbling_window`` there is no mergeable partial, so the shuffle
    is inherent.
    """
    order = [key_col, ts_col] + ([tiebreak] if tiebreak else [])
    ds, n_buckets = _resolve_buckets(ds, n_buckets)

    def bucket_sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order, kind="stable")
        ts = g[ts_col]
        gap = ts.diff().dt.total_seconds()
        new_sess = (g[key_col] != g[key_col].shift()) | (gap > gap_s)
        g = g.assign(session_id=new_sess.groupby(
            g[key_col], sort=False).cumsum().astype("int64"))
        out = (g.groupby([key_col, "session_id"], sort=False)
                .agg(n_events=(ts_col, "size"),
                     session_start=(ts_col, "min"),
                     session_end=(ts_col, "max"))
                .reset_index())
        return out

    return (ds.map_batches(_tag_bucket, batch_format="pyarrow",
                           zero_copy_batch=True,
                           fn_kwargs={"key_col": key_col,
                                      "n_buckets": n_buckets})
              .groupby("__bucket")
              .map_groups(bucket_sessions, batch_format="pandas"))


def grouped_topk(ds: rd.Dataset, group_cols: list[str], sort_col: str,
                 k: int, descending: bool = True,
                 tiebreak: "str|None" = None,
                 n_buckets: "int|None" = None) -> rd.Dataset:
    """Per-group top-k without a global sort.

    Two stages: a per-block partial keeps at most k rows per group
    seen in that block (bounds the shuffle to k rows/group/block),
    then groups hash into ``n_buckets`` buckets and each bucket takes
    its final top-k VECTORIZED (one sort + groupby.head per bucket,
    not one frame per group).  Ties break by ``tiebreak`` ascending.

    ``n_buckets=None`` derives the bucket count from the PARTIAL
    output size (the data that actually crosses the shuffle — already
    bounded to k rows/group/block), not the raw input.
    """
    order = [*group_cols, sort_col] + ([tiebreak] if tiebreak else [])
    asc = [True] * len(group_cols) + [not descending] + \
        ([True] if tiebreak else [])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(order, ascending=asc,
                                           kind="stable")
        kept = df.groupby(group_cols, sort=False).head(k)
        return pa.Table.from_pandas(kept, preserve_index=False)

    def tag(batch: pa.Table, nb: int) -> pa.Table:
        df = batch.to_pandas()
        kb = pd.util.hash_pandas_object(df[group_cols[0]]
                                        if len(group_cols) == 1
                                        else df[group_cols],
                                        index=False).to_numpy()
        return batch.append_column(
            "__bucket", pa.array((kb % nb).astype(np.int64)))

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order, ascending=asc, kind="stable")
        return (g.groupby(group_cols, sort=False).head(k)
                 .drop(columns="__bucket"))

    kept_ds = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    kept_ds, n_buckets = _resolve_buckets(kept_ds, n_buckets)
    return (kept_ds.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True,
                                fn_kwargs={"nb": n_buckets})
              .groupby("__bucket")
              .map_groups(final, batch_format="pandas"))


def _tag_bucket(batch: pa.Table, key_col: str, n_buckets: int) -> pa.Table:
    """Append a __bucket column: stable hash of key_col mod n_buckets."""
    kb = pd.util.hash_pandas_object(
        batch.column(key_col).to_pandas(), index=False).to_numpy()
    return batch.append_column(
        "__bucket", pa.array((kb % n_buckets).astype(np.int64)))


# one bucket becomes ONE pandas frame inside map_groups — cap its rows
# so the frame fits a worker's heap at any input scale
TARGET_ROWS_PER_BUCKET = 1_000_000


def _resolve_buckets(ds: rd.Dataset, n_buckets: "int|None",
                     target: int = TARGET_ROWS_PER_BUCKET):
    """``n_buckets=None`` -> derive the bucket count from the input
    size: ``max(32, ceil(rows / target))``, so a bucket's pandas frame
    stays bounded no matter how much data flows in (a fixed 32 meant
    rows/32 per frame — fine at sf0.1, OOM at 100x).

    Counting requires executing the plan, so the input is materialized
    ONCE and the returned dataset reuses those blocks — for the window
    ops every row is about to cross the bucket shuffle anyway, so the
    extra cost is one object-store pass, not a second plan execution.
    An explicit ``n_buckets`` skips all of this (and the materialize).
    """
    if n_buckets is not None:
        return ds, int(n_buckets)
    mat = ds.materialize()
    return mat, max(32, -(-(mat.count() or 1) // target))


def lag_delta(ds: rd.Dataset, key_col: str, order_cols: list[str],
              val_col: str, out_cols: list[str], out_col: str = "delta",
              integer_out: bool = True,
              n_buckets: "int|None" = None) -> rd.Dataset:
    """Per-key window lag difference: out_col = val - LAG(val) OVER
    (PARTITION BY key ORDER BY order_cols); NULL for each key's first row.

    Scale shape: keys hash into ``n_buckets`` groups (ONE shuffle,
    same scheme as ``sessionize``); each bucket computes every key's
    lags VECTORIZED in one sort + shift, never one pandas frame per
    key.  A window needs the key's full ordered run co-located, so the
    shuffle is inherent — but it moves each row once.
    """
    order = [key_col, *order_cols]
    ds, n_buckets = _resolve_buckets(ds, n_buckets)

    def bucket_fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order, kind="stable")
        prev = g[val_col].shift()
        prev[~g[key_col].eq(g[key_col].shift())] = np.nan
        delta = g[val_col] - prev
        out = g[list(out_cols)].copy()
        out[out_col] = (pd.array(delta.round(), dtype="Int64")
                        if integer_out else delta)
        return out

    return (ds.map_batches(_tag_bucket, batch_format="pyarrow",
                           zero_copy_batch=True,
                           fn_kwargs={"key_col": key_col,
                                      "n_buckets": n_buckets})
              .groupby("__bucket")
              .map_groups(bucket_fn, batch_format="pandas"))


def cumsum_by_key(ds: rd.Dataset, key_col: str, order_cols: list[str],
                  val_col: str, out_cols: list[str],
                  out_col: str = "running",
                  n_buckets: "int|None" = None) -> rd.Dataset:
    """Per-key running total: out_col = SUM(val) OVER (PARTITION BY key
    ORDER BY order_cols ROWS UNBOUNDED PRECEDING).

    Same one-shuffle bucket scheme as ``lag_delta``.  For exact,
    order-independent equality against a SQL oracle pass an integer
    val_col (e.g. money scaled to cents) — integer cumsum has no
    floating-point association noise.
    """
    order = [key_col, *order_cols]
    ds, n_buckets = _resolve_buckets(ds, n_buckets)

    def bucket_fn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order, kind="stable")
        out = g[list(out_cols)].copy()
        out[out_col] = g.groupby(key_col, sort=False)[val_col].cumsum()
        return out

    return (ds.map_batches(_tag_bucket, batch_format="pyarrow",
                           zero_copy_batch=True,
                           fn_kwargs={"key_col": key_col,
                                      "n_buckets": n_buckets})
              .groupby("__bucket")
              .map_groups(bucket_fn, batch_format="pandas"))


def _arrow_type(t) -> pa.DataType:
    """Coerce a ds.schema() type to arrow: pandas-block datasets report
    numpy dtypes (object columns → string)."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def _arrow_schema_of(ds: rd.Dataset) -> pa.Schema:
    """Arrow schema of a dataset regardless of block format: arrow
    blocks expose it directly; pandas blocks report numpy dtypes."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema([(n, _arrow_type(t))
                      for n, t in zip(sch.names, sch.types)])


def _ints_to_bin(col: "pa.ChunkedArray|pa.Array", np_dtype) -> pa.Array:
    """Encode a 64-bit int column as 8-byte binary so it survives the
    pandas null-padding round-trip EXACTLY (int64 with nulls widens to
    float64, silently corrupting values past 2^53 — e.g. this repo's
    own 64-bit content/sim hashes).

    Genuine nulls keep their validity bitmap (a null slot stays null in
    the binary column) instead of materializing as NaN->INT64_MIN."""
    n_null = col.null_count
    if n_null and isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if n_null:
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        v = np.ascontiguousarray(pc.fill_null(col, 0)
                                 .to_numpy(zero_copy_only=False)
                                 .astype(np_dtype))
        validity_buf = pa.array(valid).buffers()[1]
    else:
        v = np.ascontiguousarray(
            col.to_numpy(zero_copy_only=False).astype(np_dtype))
        validity_buf = None
    # fixed_size_binary, NOT numpy "S8": S-strings strip trailing NUL
    # bytes, truncating any value whose little-endian high bytes are 0
    return pa.Array.from_buffers(pa.binary(8), len(v),
                                 [validity_buf, pa.py_buffer(v.tobytes())],
                                 null_count=n_null)


def _bin_to_ints(series: "pd.Series", np_dtype):
    """Decode 8-byte binary values back to their int dtype; null slots
    (genuine nulls carried through `_ints_to_bin`) come back as pd.NA
    in a pandas nullable integer array."""
    vals = series.to_numpy()
    if not len(vals):
        return np.array([], dtype=np_dtype)
    isna = pd.isna(vals)
    if not isna.any():
        return np.frombuffer(b"".join(vals), dtype=np_dtype)
    out = np.zeros(len(vals), dtype=np_dtype)
    ok = ~isna
    if ok.any():
        out[ok] = np.frombuffer(b"".join(vals[ok]), dtype=np_dtype)
    return pd.arrays.IntegerArray(out, mask=isna)


def semi_anti_join(left: rd.Dataset, right: rd.Dataset, on: str,
                   right_on: "str|None" = None, anti: bool = False,
                   n_buckets: int = 64) -> rd.Dataset:
    """Distributed semi/anti join: left rows whose key does (semi) or
    does not (anti) appear in right.

    Scale shape: the right side is narrowed to its key column and
    PADDED to the left schema (null columns cost nothing), both sides
    hash-bucket by key into one union + ONE shuffle, and each bucket
    filters its left rows against its right keys vectorized with
    ``isin``.  Neither side is broadcast or gathered; key skew spreads
    across buckets because a bucket holds many keys.

    Null keys follow pandas ``isin`` (NaN matches NaN), not SQL's
    NULL-never-equals — pre-filter nulls for strict SQL parity.

    Alternative: ``hash_join(..., how="semi"/"anti")`` reaches Ray's
    native left_semi/left_anti hash-shuffle operator (aggregator
    actors).  This task-only variant exists for pipelines that must
    not reserve actor slots and for ``right_on`` key renames.
    """
    right_on = right_on or on
    arrow_sch = _arrow_schema_of(left)
    if on not in arrow_sch.names:
        raise KeyError(f"unknown join column {on!r}")
    # 64-bit int payload columns ride as fixed-size binary: the right
    # side's null padding would widen them to float64 in the pandas
    # group frames, silently corrupting values past 2^53 (the key
    # column is populated on BOTH sides, so it never widens)
    binmap = {f.name: (np.dtype("uint64")
                       if pa.types.is_unsigned_integer(f.type)
                       else np.dtype("int64"))
              for f in arrow_sch
              if f.name != on and f.type in (pa.int64(), pa.uint64())}

    def tag_left(batch: pa.Table) -> pa.Table:
        for c, dt in binmap.items():
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, _ints_to_bin(batch.column(c), dt))
        t = _tag_bucket(batch, on, n_buckets)
        return t.append_column(
            "__side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    def pad_right(batch: pa.Table) -> pa.Table:
        keys = batch.column(right_on)
        cols, names = [], []
        for f in arrow_sch:
            names.append(f.name)
            if f.name == on:
                cols.append(keys.cast(f.type))
            elif f.name in binmap:
                cols.append(pa.nulls(len(keys), pa.binary(8)))
            else:
                cols.append(pa.nulls(len(keys), f.type))
        t = pa.Table.from_arrays(cols, names=names)
        t = _tag_bucket(t, on, n_buckets)
        return t.append_column(
            "__side", pa.array(np.ones(t.num_rows, dtype=np.int8)))

    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = (right.select_columns([right_on])
               .map_batches(pad_right, batch_format="pyarrow",
                            zero_copy_batch=True))

    def bucket_fn(group: pd.DataFrame) -> pa.Table:
        mine = group[group["__side"] == 0]
        rkeys = group.loc[group["__side"] == 1, on].unique()
        keep = mine[on].isin(rkeys)
        if anti:
            keep = ~keep
        out = mine.loc[keep, list(arrow_sch.names)].copy()
        for c, dt in binmap.items():  # decode the stashed 64-bit ints
            out[c] = _bin_to_ints(out[c], dt)
        # remaining (<=32-bit) int columns widened to float64 in pandas;
        # side-0 rows have no nulls, so the cast back is lossless
        return pa.Table.from_pandas(out, preserve_index=False).cast(arrow_sch)

    return (lt.union(rt)
              .groupby("__bucket")
              .map_groups(bucket_fn, batch_format="pandas"))


def semi_join(left: rd.Dataset, right: rd.Dataset, on: str,
              right_on: "str|None" = None, n_buckets: int = 64) -> rd.Dataset:
    return semi_anti_join(left, right, on, right_on, anti=False,
                          n_buckets=n_buckets)


def anti_join(left: rd.Dataset, right: rd.Dataset, on: str,
              right_on: "str|None" = None, n_buckets: int = 64) -> rd.Dataset:
    return semi_anti_join(left, right, on, right_on, anti=True,
                          n_buckets=n_buckets)


def pivot_counts(ds: rd.Dataset, key_col: str, pivot_col: str,
                 values: list[str], prefix: str = "n_") -> rd.Dataset:
    """COUNT(*) FILTER pivot: one int64 count column per pivot value.

    Per-batch crosstab partials (one row per key per batch — tiny)
    pre-combine BEFORE the shuffle; the groupby moves partial count
    rows only, never raw rows.  Null keys are dropped (pandas crosstab
    semantics), unlike SQL GROUP BY which keeps a NULL group.
    """
    out_names = [prefix + v for v in values]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, pivot_col]).to_pandas()
        ct = pd.crosstab(df[key_col], df[pivot_col])
        out = {key_col: ct.index.to_numpy()}
        for v, name in zip(values, out_names):
            out[name] = (ct[v].to_numpy(dtype=np.int64)
                         if v in ct.columns
                         else np.zeros(len(ct), dtype=np.int64))
        return pa.Table.from_pydict(out)

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return groupby_agg(part, [key_col],
                       {name: ("sum", name) for name in out_names})


@ray.remote
def _block_key_counts(block, key_col: str):
    """Per-block run-length key counts of a (key-)sorted block."""
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if block.num_rows == 0 or key_col not in block.column_names:
        # Ray can emit empty blocks with NO columns at all (observed
        # downstream of sorts in long sessions) — zero keys either way
        return [], []
    keys = block.column(key_col).to_pandas().to_numpy()
    if not len(keys):
        return [], []
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(keys)]))
    return keys[starts].tolist(), (ends - starts).tolist()


@ray.remote
def _block_take(block, idxs: list[int]) -> list:
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    return block.take(pa.array(idxs)).to_pylist()


def grouped_percentile_disc(ds: rd.Dataset, key_col: str, val_col: str,
                            ps: list[float]) -> pa.Table:
    """Exact per-group discrete percentiles (quantile_disc semantics:
    the sorted group's element at index ceil(p*n)-1) WITHOUT gathering
    any group.

    Scale shape: ONE distributed range sort by (key, val) — the only
    all-to-all — then per-block run-length (key, count) partials
    (bytes per block, not rows) let the driver place each group's
    target global row index and fetch exactly those rows with
    per-block ``take`` tasks.  Works for groups far larger than any
    single worker's memory, unlike a per-group gather.
    Returns a small Arrow table (key, p, val) sorted by (key, p).
    """
    def drop_null_vals(batch: pa.Table) -> pa.Table:
        # SQL aggregate semantics: NULL values don't participate
        return batch.filter(pc.is_valid(batch.column(val_col)))

    sorted_ds = (ds.select_columns([key_col, val_col])
                   .map_batches(drop_null_vals, batch_format="pyarrow",
                                zero_copy_batch=True)
                   .sort([key_col, val_col]).materialize())
    refs, rows_per_block = [], []
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            refs.append(block_ref)
            rows_per_block.append(meta.num_rows or 0)
    counts = ray.get([_block_key_counts.remote(r, key_col) for r in refs])

    # global (key -> (start_offset, n)) from in-order block partials
    offsets: dict = {}
    totals: dict = {}
    pos = 0
    for keys, ns in counts:
        for k, n in zip(keys, ns):
            if k not in offsets:
                offsets[k] = pos
                totals[k] = 0
            totals[k] += n
            pos += n

    block_starts = np.concatenate(([0], np.cumsum(rows_per_block)))[:-1]
    wanted: dict[int, list[tuple[int, object, float]]] = {}
    for k in offsets:
        for p in ps:
            gi = offsets[k] + max(int(np.ceil(p * totals[k])) - 1, 0)
            bi = int(np.searchsorted(block_starts, gi, side="right") - 1)
            wanted.setdefault(bi, []).append((gi - int(block_starts[bi]), k, p))

    fetches = {bi: _block_take.remote(refs[bi], [w[0] for w in ws])
               for bi, ws in wanted.items()}
    out = []
    for bi, ws in wanted.items():
        rows = ray.get(fetches[bi])
        for (_, k, p), row in zip(ws, rows):
            out.append((k, p, row[val_col]))
    out.sort(key=lambda t: (t[0], t[1]))
    return pa.Table.from_pydict({
        key_col: [t[0] for t in out],
        "p": [t[1] for t in out],
        val_col: [t[2] for t in out],
    })


def range_join_broadcast(ds: rd.Dataset, val_col: str,
                         bins: "pd.DataFrame", lo_col: str = "lo",
                         hi_col: str = "hi",
                         how: str = "inner") -> rd.Dataset:
    """Range join against a small table of NON-OVERLAPPING, sorted
    half-open intervals [lo, hi): each row gains the columns of its
    covering interval (SQL ``JOIN bins ON v >= lo AND v < hi``).

    Scale shape: the bin table is broadcast ONCE via ``ray.put`` and
    matched per batch with one vectorized ``np.searchsorted`` — no
    shuffle, no per-row loop.  ``how="inner"`` drops unmatched rows;
    ``"left"`` keeps them with null bin columns.  Overlapping
    intervals need a different operator (each row could match many).
    """
    b = bins.sort_values(lo_col).reset_index(drop=True)
    los = b[lo_col].to_numpy()
    his = b[hi_col].to_numpy()
    if (los[1:] < his[:-1]).any():
        raise ValueError("range_join_broadcast requires non-overlapping intervals")
    payload_cols = [c for c in b.columns if c not in (lo_col, hi_col)]
    bins_ref = ray.put((los, his, {c: b[c].to_numpy() for c in payload_cols}))

    def match(batch: pa.Table) -> pa.Table:
        blos, bhis, payload = ray.get(bins_ref)
        v = batch.column(val_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(blos, v, side="right") - 1
        ok = (idx >= 0) & (v < bhis[np.clip(idx, 0, None)])
        if how == "inner":
            batch = batch.filter(pa.array(ok))
            sel = idx[ok]
            for c in payload_cols:
                batch = batch.append_column(c, pa.array(payload[c][sel]))
            return batch
        safe = np.where(ok, idx, 0)
        for c in payload_cols:
            arr = pa.array(payload[c][safe], mask=~ok)
            batch = batch.append_column(c, arr)
        return batch

    return ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
