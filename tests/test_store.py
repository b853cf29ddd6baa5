"""Snapshot-store unit behaviors: commit visibility, merge-on-read,
multi-crawl reads, meta atomicity."""

from __future__ import annotations

from web_crawler_spark.store import (
    FRONTIER_SCHEMA,
    UPDATES_SCHEMA,
    SnapshotStore,
)


def _frontier_row(cid, h, key, status="PENDING", attempts=0, wave=0):
    return (cid, h, key, key[8:], "HTTPS://", "d", "1.2.3.4", 1, 3,
            status, attempts, wave, "1ms")


def test_merge_on_read_latest_update_wins(spark, tmp_path):
    store = SnapshotStore(tmp_path)
    store.write_crawl_meta({"crawl_id": "c", "status": "running"})
    ins = spark.createDataFrame(
        [_frontier_row("c", 1, "HTTPS://A.TEST"), _frontier_row("c", 2, "HTTPS://B.TEST")],
        FRONTIER_SCHEMA,
    )
    store.write_delta(ins, "c", 0, "inserts")
    store.commit_wave("c", 0, {})
    # wave 1: A -> PENDING attempts=1 ; wave 2: A -> COMPLETED
    u1 = spark.createDataFrame([("c", 1, "HTTPS://A.TEST", "PENDING", 1, 1)], UPDATES_SCHEMA)
    store.write_delta(u1, "c", 1, "updates")
    store.commit_wave("c", 1, {})
    u2 = spark.createDataFrame([("c", 1, "HTTPS://A.TEST", "COMPLETED", 1, 2)], UPDATES_SCHEMA)
    store.write_delta(u2, "c", 2, "updates")
    store.commit_wave("c", 2, {})

    rows = {r.full_key: (r.status, r.attempts) for r in store.frontier(spark, "c").collect()}
    assert rows == {
        "HTTPS://A.TEST": ("COMPLETED", 1),   # latest update wins
        "HTTPS://B.TEST": ("PENDING", 0),     # untouched insert
    }


def test_uncommitted_wave_invisible_and_cleaned(spark, tmp_path):
    store = SnapshotStore(tmp_path)
    store.write_crawl_meta({"crawl_id": "c", "status": "running"})
    ins = spark.createDataFrame([_frontier_row("c", 1, "HTTPS://A.TEST")], FRONTIER_SCHEMA)
    store.write_delta(ins, "c", 0, "inserts")
    store.commit_wave("c", 0, {})
    # wave 1 written but NOT committed
    ins2 = spark.createDataFrame([_frontier_row("c", 2, "HTTPS://B.TEST")], FRONTIER_SCHEMA)
    store.write_delta(ins2, "c", 1, "inserts")
    assert store.committed_waves("c") == [0]
    assert store.frontier(spark, "c").count() == 1
    dropped = store.clean_uncommitted("c")
    assert dropped == [1]
    assert not store.wave_dir("c", 1).exists()


def test_frontier_all_unions_crawls(spark, tmp_path):
    store = SnapshotStore(tmp_path)
    for cid, h in [("c1", 1), ("c2", 2)]:
        store.write_crawl_meta({"crawl_id": cid, "status": "running"})
        ins = spark.createDataFrame(
            [_frontier_row(cid, h, f"HTTPS://{cid.upper()}.TEST")], FRONTIER_SCHEMA
        )
        store.write_delta(ins, cid, 0, "inserts")
        store.commit_wave(cid, 0, {})
    assert store.frontier_all(spark).count() == 2
    assert store.list_crawls() == ["c1", "c2"]


def test_meta_roundtrip_and_summary(spark, tmp_path):
    store = SnapshotStore(tmp_path)
    meta = {"crawl_id": "c", "status": "running", "requested_depth": 3}
    store.write_crawl_meta(meta)
    assert store.read_crawl_meta("c") == meta
    ins = spark.createDataFrame([], FRONTIER_SCHEMA)
    store.write_delta(ins, "c", 0, "inserts")
    store.commit_wave("c", 0, {"children": 0})
    assert store.wave_summary("c", 0)["children"] == 0
