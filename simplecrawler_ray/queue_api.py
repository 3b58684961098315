"""FrontierQueue: queue-state queries over the frontier dataset.

API parity with the reference ``FetchQueue`` (src/queue.ts:79-314):
``max``/``min``/``avg`` statistics (fetched rows only, allowed-name
validation, src/queue.ts:192-247), ``count_items``/``filter_items``
with nested partial-match comparators (deep ``compare``
src/queue.ts:16-34), ``oldest_unfetched``, ``freeze``/``defrost``
(JSON file -> per-partition parquet checkpoint, src/queue.ts:268-313).

Works over either a ``pyarrow.Table`` (driver-side queue state) or a
``ray.data.Dataset`` (distributed frontier): Table ops use
pyarrow.compute; Dataset ops use vectorized ``map_batches`` predicates
and streaming aggregates — no driver materialization of the frontier.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .schemas import STATUS_QUEUED, STATUS_SPOOLED

ALLOWED_STATISTICS = {
    "actualDataSize": "state_actual_data_size",
    "contentLength": "state_content_length",
    "downloadTime": "state_download_time_ms",
    "requestLatency": "state_request_latency_ms",
    "requestTime": "state_request_time_ms",
}

_STATE_FIELD_MAP = {
    **ALLOWED_STATISTICS,
    "code": "state_code",
    "contentType": "state_content_type",
    "headers": "state_headers",
    "sentIncorrectSize": "state_sent_incorrect_size",
}


class InvalidStatistic(ValueError):
    pass


@ray.remote(num_returns=2)
def _update_block_at(block, local_idx: int, flat: dict):
    """Worker-side positional update of one queue block: returns
    (updated_block, updated_row_dict) — the block stays in the object
    store, the driver swaps the ref.  The rewrite is zero-copy slices
    around a patched one-row table (no whole-column ``to_pylist``)."""
    import pandas as pd

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    from .pipelines.crawl import _patch_row

    return _patch_row(block, local_idx, flat)


def _requeue_spooled(t: pa.Table) -> pa.Table:
    status = t.column("status")
    status = pc.if_else(pc.equal(status, STATUS_SPOOLED),
                        pa.scalar(STATUS_QUEUED), status)
    return t.set_column(t.schema.get_field_index("status"), "status", status)


@ray.remote
def _freeze_block(block, out_path: str) -> int:
    import pandas as pd

    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    block = _requeue_spooled(block)
    pq.write_table(block, out_path)
    return block.num_rows


@ray.remote
def _block_to_arrow(block):
    import pandas as pd

    if isinstance(block, pd.DataFrame):
        return pa.Table.from_pandas(block, preserve_index=False)
    return block


def _flatten_comparator(comparator: dict) -> dict[str, Any]:
    """{stateData: {code: 200}, fetched: True} -> {state_code: 200, ...}"""
    flat: dict[str, Any] = {}
    for k, v in comparator.items():
        if k == "stateData" and isinstance(v, dict):
            for sk, sv in v.items():
                col = _STATE_FIELD_MAP.get(sk)
                if col is None:
                    raise KeyError(f"unknown stateData field {sk!r}")
                flat[col] = sv
        else:
            flat[k] = v
    return flat


def _deep_match(query: dict, obj) -> bool:
    """Reference ``compare`` parity (src/queue.ts:16-34): every query
    key must match in obj; nested dicts recurse (partial match)."""
    if not isinstance(obj, dict):
        return False
    for k, v in query.items():
        if isinstance(v, dict):
            if not _deep_match(v, obj.get(k)):
                return False
        elif obj.get(k) != v:
            return False
    return True


def _predicate(table: pa.Table, flat: dict[str, Any]) -> pa.Array:
    import json as _json

    mask = None
    for col, val in flat.items():
        if col not in table.column_names:
            raise KeyError(f"unknown column {col!r}")
        if isinstance(val, dict):
            # deep partial match against a JSON-string column (e.g.
            # state_headers) — pc.equal(string, struct scalar) raises
            def _row_ok(blob):
                if not blob:
                    return False
                try:
                    return _deep_match(val, _json.loads(blob))
                except (ValueError, TypeError):
                    return False
            m = pa.array([_row_ok(b)
                          for b in table.column(col).to_pylist()])
        else:
            m = pc.fill_null(pc.equal(table.column(col), pa.scalar(val)),
                             False)
        mask = m if mask is None else pc.and_(mask, m)
    return mask if mask is not None else pa.array([True] * table.num_rows)


class FrontierQueue:
    def __init__(self, data: Union[pa.Table, "ray.data.Dataset"]):
        self._data = data
        self._is_table = isinstance(data, pa.Table)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_parquet(cls, path: str) -> "FrontierQueue":
        return cls(pq.read_table(path))

    # -- internals ---------------------------------------------------------
    def _table(self) -> pa.Table:
        return self._data

    def _map_filter(self, flat: dict[str, Any]):
        """Dataset path: vectorized predicate inside map_batches."""
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(_predicate(batch, flat))
        return self._data.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    # -- stats (fetched rows only; src/queue.ts:192-247) -------------------
    def _stat_column(self, statistic: str) -> str:
        if statistic not in ALLOWED_STATISTICS:
            raise InvalidStatistic(f"Invalid statistic {statistic!r}")
        return ALLOWED_STATISTICS[statistic]

    def max(self, statistic: str) -> float:
        col = self._stat_column(statistic)
        if self._is_table:
            t = self._table()
            vals = t.filter(pc.fill_null(t.column("fetched"), False)).column(col)
            v = pc.max(vals).as_py()
            return v if v is not None else 0
        v = self._map_filter({"fetched": True}).max(col)
        return v if v is not None else 0

    def min(self, statistic: str) -> float:
        col = self._stat_column(statistic)
        if self._is_table:
            t = self._table()
            vals = t.filter(pc.fill_null(t.column("fetched"), False)).column(col)
            v = pc.min(vals).as_py()
            return v if v is not None else 0
        v = self._map_filter({"fetched": True}).min(col)
        return v if v is not None else 0

    def avg(self, statistic: str) -> float:
        col = self._stat_column(statistic)
        if self._is_table:
            t = self._table()
            vals = t.filter(pc.fill_null(t.column("fetched"), False)).column(col)
            v = pc.mean(vals).as_py()
            return v if v is not None else float("nan")
        v = self._map_filter({"fetched": True}).mean(col)
        return v if v is not None else float("nan")

    # -- comparator queries ------------------------------------------------
    def filter_items(self, comparator: dict) -> pa.Table:
        flat = _flatten_comparator(comparator)
        if self._is_table:
            t = self._table()
            return t.filter(_predicate(t, flat))
        return gather_concat(self._map_filter(flat))

    def count_items(self, comparator: dict) -> int:
        flat = _flatten_comparator(comparator)
        if self._is_table:
            t = self._table()
            return int(pc.sum(pc.cast(_predicate(t, flat), pa.int64())).as_py() or 0)
        return self._map_filter(flat).count()

    def get(self, index: int) -> dict:
        """Row by queue position (src/queue.ts:145-155); RangeError parity
        -> IndexError past the end."""
        if index < 0:
            # RangeError parity: Arrow negative indexing would silently
            # return rows from the END
            raise IndexError("Index was greater than the queue's length")
        if self._is_table:
            t = self._table()
            if index >= t.num_rows:
                raise IndexError("Index was greater than the queue's length")
            return {c: t.column(c)[index].as_py() for c in t.column_names}
        rows = self._data.take(index + 1)
        if len(rows) <= index:
            raise IndexError("Index was greater than the queue's length")
        return rows[index]

    def update(self, index: int, updates: dict) -> dict:
        """Point update by queue position with deep-assign semantics
        (src/queue.ts:157-174): nested ``stateData`` keys map onto the
        flattened ``state_*`` columns; unknown fields raise (the
        reference rejects them with an error callback).  Returns the
        updated row.  The engine's own round pipeline never mutates
        rows (J3 lineage columns); this is the user-facing API for
        ported queue-manipulating code.  On a Dataset-backed queue the
        block holding the row is rewritten worker-side and its ref
        swapped — rows never gather to the driver."""
        if index < 0:
            raise IndexError("Index was greater than the queue's length")
        if not self._is_table:
            return self._update_dataset(index, updates)
        t = self._table()
        if index >= t.num_rows:
            raise IndexError("Index was greater than the queue's length")
        flat = _flatten_comparator(updates)
        for col in flat:
            if col not in t.column_names:
                raise KeyError(f"unknown column {col!r}")
        # zero-copy slice patch (shared _patch_row) — the earlier
        # per-updated-column to_pylist was O(n_rows) per update
        from .pipelines.crawl import _patch_row

        self._data, row = _patch_row(t, index, flat)
        return row

    def _update_dataset(self, index: int, updates: dict) -> dict:
        import ray.data as rd

        flat = _flatten_comparator(updates)
        sch = self._data.schema()
        for col in flat:
            if col not in sch.names:
                raise KeyError(f"unknown column {col!r}")
        mat = self._data.materialize()
        blocks = [(ref, meta.num_rows or 0)
                  for b in mat.iter_internal_ref_bundles()
                  for ref, meta in b.blocks]
        off = 0
        target, local = None, None
        for i, (ref, n) in enumerate(blocks):
            if off <= index < off + n:
                target, local = i, index - off
                break
            off += n
        if target is None:
            raise IndexError("Index was greater than the queue's length")
        new_ref, row_ref = _update_block_at.remote(blocks[target][0], local,
                                                   flat)
        refs = [r for r, _ in blocks]
        refs[target] = new_ref
        row = ray.get(row_ref)
        # from_arrow_refs requires Arrow blocks, but a pandas-backed
        # queue (e.g. built via from_pandas) passes its unmodified
        # blocks through untouched — convert those worker-side first
        # (round-3 advice #6).  The block format is decided DATASET-
        # wide, so one driver-side schema check replaces the earlier
        # per-block probe tasks (which deserialized every block's rows
        # just to learn its type, on every update)
        all_arrow = isinstance(getattr(sch, "base_schema", None), pa.Schema)
        if not all_arrow:
            refs = [r if i == target else _block_to_arrow.remote(r)
                    for i, r in enumerate(refs)]
        self._data = rd.from_arrow_refs(refs)
        return row

    def get_length(self) -> int:
        return self._data.num_rows if self._is_table else self._data.count()

    def oldest_unfetched(self) -> Optional[dict]:
        """Min-seq row with status=queued (src/queue.ts:176-189)."""
        if self._is_table:
            t = self._table()
            q = t.filter(pc.equal(t.column("status"), STATUS_QUEUED))
            if q.num_rows == 0:
                return None
            idx = pc.index(q.column("seq"), pc.min(q.column("seq")).as_py()).as_py()
            return {c: q.column(c)[idx].as_py() for c in q.column_names}
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("status"), STATUS_QUEUED))
        q = self._data.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        rows = q.sort("seq").take(1)
        return rows[0] if rows else None

    # -- freeze/defrost (S3/S4) --------------------------------------------
    def freeze(self, path: str) -> None:
        """Checkpoint the frontier; in-flight (spooled) rows re-queued
        first (src/queue.ts:270-274).  Table backend: one file
        (reference parity; driver-sized queues).  Dataset backend:
        ``path`` becomes a DIRECTORY of per-block part files written
        WORKER-side (atomic publish via rename) — the frontier never
        gathers to the driver and a crash mid-write cannot corrupt an
        existing checkpoint.  ``defrost`` reads either layout.

        Multi-node caveat (same contract as ``SeenSet.save``): the
        per-block part files are written by worker TASKS from whatever
        node runs them, and the final publish is an ``os.replace`` on
        the driver — ``path`` must therefore be on a filesystem shared
        by every node (NFS / fuse mount), as is standard for cluster
        checkpoints.  On a single node any local path works."""
        if self._is_table:
            t = self._table()
            t = _requeue_spooled(t)
            pq.write_table(t, path)
            return
        import os
        import shutil

        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        mat = self._data.materialize()
        refs = [ref for b in mat.iter_internal_ref_bundles()
                for ref, _meta in b.blocks]
        ray.get([
            _freeze_block.remote(r, os.path.join(tmp, f"part-{i:05d}.parquet"))
            for i, r in enumerate(refs)])
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        os.replace(tmp, path)
        self._data = mat

    @classmethod
    def defrost(cls, path: str) -> "FrontierQueue":
        return cls.from_parquet(path)

    def seen_hashes(self):
        """url_hash column for seen-set replay on defrost — on the
        dataset backend only the hash column transits the driver."""
        if self._is_table:
            t = self._table()
        else:
            t = gather_concat(
                self._data.select_columns(["url_hash"]))
        return t.column("url_hash").to_numpy(zero_copy_only=False)


def deep_assign(target: dict, updates: dict) -> dict:
    """Reference ``deepAssign`` parity (src/queue.ts:157-174 update
    path): nested dicts merge recursively, scalars overwrite."""
    for k, v in updates.items():
        if isinstance(v, dict) and isinstance(target.get(k), dict):
            deep_assign(target[k], v)
        else:
            target[k] = v
    return target


def ray_get_all(ds) -> list[pa.Table]:
    from .ops import gather_tables

    return gather_tables(ds)


def gather_concat(ds) -> pa.Table:
    """Gather + concat dataset blocks; empty-safe (a comparator matching
    nothing returns a schema-bearing empty table, not ArrowInvalid)."""
    md = ds.materialize()
    tables = [t for t in (ray.get(r) for r in md.to_arrow_refs()) if t.num_rows]
    if tables:
        return pa.concat_tables(tables)
    sch = md.schema()
    try:
        return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    except Exception:
        from .schemas import FRONTIER_SCHEMA

        return FRONTIER_SCHEMA.empty_table()
