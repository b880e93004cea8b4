"""SnapshotTable: commits, MERGE idempotency, time travel, lineage."""

import pytest

from etherscan_contract_crawler_spark.storage.icetable import SnapshotTable


def test_append_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create("k string, v int")
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"))
    t.append(spark.createDataFrame([("c", 3)], "k string, v int"))
    assert t.read(spark).count() == 3
    assert t.read(spark, version=1).count() == 2
    assert t.read(spark, version=0).count() == 0
    assert t.snapshot_ids() == [0, 1, 2]


def test_merge_not_matched_idempotent(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create("k string, v int")
    df = spark.createDataFrame([("a", 1), ("b", 2), ("b", 2)], "k string, v int")
    _, n1 = t.merge_not_matched(df, ["k"])
    assert n1 == 2  # in-batch dup collapsed
    _, n2 = t.merge_not_matched(df, ["k"])
    assert n2 == 0  # replay inserts nothing
    df2 = spark.createDataFrame([("b", 9), ("c", 3)], "k string, v int")
    _, n3 = t.merge_not_matched(df2, ["k"])
    assert n3 == 1
    assert t.read(spark).count() == 3


def test_lineage_accumulates(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create("k string")
    t.append(spark.createDataFrame([("a",)], "k string"), lineage={"epoch": 0, "x": 1})
    t.append(spark.createDataFrame([("b",)], "k string"), lineage={"epoch": 1})
    lin = t.lineage()
    assert lin["epoch"] == 1 and lin["x"] == 1
    assert t.lineage(version=1) == {"epoch": 0, "x": 1}


def test_empty_read_has_schema(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.create("k string, v int")
    df = t.read(spark)
    assert df.count() == 0 and set(df.columns) == {"k", "v"}


@pytest.mark.slow
def test_compact_and_expire_bounds_dirs(spark, tmp_path):
    """r1 VERDICT #3 'done' criterion: 50 epochs of merges accrete 50 data
    dirs; compact + expire must collapse them to one with identical reads
    and reclaim the stranded dirs."""
    import os

    t = SnapshotTable(str(tmp_path / "t"))
    t.create("k string, epoch int")
    for e in range(50):
        df = spark.createDataFrame([(f"k{e}_{i}", e) for i in range(20)], "k string, epoch int")
        t.merge_not_matched(df, ["k"], lineage={"epoch": e})
    assert len(t.manifest()["data_dirs"]) == 50
    before = {tuple(r) for r in t.read(spark).collect()}

    t.compact(spark)
    # keep_last=2 still references the pre-compact snapshot (Iceberg
    # semantics: space frees only when no retained snapshot needs it) —
    # expiring down to the compacted snapshot reclaims everything
    expired = t.expire_snapshots(keep_last=1)
    assert len(t.manifest()["data_dirs"]) == 1
    assert {tuple(r) for r in t.read(spark).collect()} == before
    assert t.lineage()["epoch"] == 49  # lineage survives compaction
    assert len(expired) >= 50
    # stranded per-epoch dirs physically reclaimed
    data_root = os.path.join(str(tmp_path / "t"), "data")
    assert len(os.listdir(data_root)) == 1
    # snapshot metadata bounded too
    assert len(t.snapshot_ids()) <= 2


def test_gc_orphans_removes_uncommitted_staging(spark, tmp_path):
    """Crash leftovers: a staged .raw dir whose commit never landed must be
    GC'd; a committed one must survive (minus its valid=false partition)."""
    import os

    t = SnapshotTable(str(tmp_path / "t"))
    t.create("k string, v int")
    sid, raw_dir = t.staging_raw_dir()
    df = spark.createDataFrame([("a", 1, True), ("b", 2, False)], "k string, v int, valid boolean")
    df.write.mode("overwrite").partitionBy("valid").parquet(raw_dir)
    # crash before commit_staged: dir exists, unreferenced
    removed = t.gc_orphans()
    assert any(r.endswith(".raw") for r in removed)
    assert not os.path.exists(raw_dir)

    # committed staging dir survives GC; its valid=false payloads don't
    sid2, raw2 = t.staging_raw_dir()
    df.write.mode("overwrite").partitionBy("valid").parquet(raw2)
    t.commit_staged(sid2, os.path.join(raw2, "valid=true"))
    t.gc_orphans()
    assert os.path.isdir(os.path.join(raw2, "valid=true"))
    assert not os.path.exists(os.path.join(raw2, "valid=false"))
    assert t.read(spark).count() == 1


def test_stage_append_invisible_until_commit(spark, tmp_path):
    """The engine's concurrent commit wave stages url_seen's data write and
    defers the manifest commit until the dead-letter merge lands (crash
    ordering). Pin the contract: a staged dir is invisible to readers,
    reclaimed by gc_orphans if the commit never happens, and the commit
    guard rejects a stale sid (concurrent commit on the same table)."""
    import os

    import pytest as _pytest

    t = SnapshotTable(str(tmp_path / "t"))
    t.create("k string, v int")
    t.append(spark.createDataFrame([("a", 1)], "k string, v int"))

    sid, d, n = t.stage_append(spark.createDataFrame([("b", 2)], "k string, v int"))
    assert n == 1 and os.path.isdir(d)
    assert t.read(spark).count() == 1  # staged rows invisible
    # crash before commit: startup GC reclaims the unreferenced dir
    removed = t.gc_orphans()
    assert removed and not os.path.exists(d)

    # normal path: stage then commit makes the rows visible with lineage
    sid2, d2, _ = t.stage_append(spark.createDataFrame([("c", 3)], "k string, v int"))
    t.commit_append(sid2, d2, lineage={"epoch": 7})
    assert t.read(spark).count() == 2
    assert t.lineage()["epoch"] == 7

    # stale-sid guard: another commit raced in between stage and commit
    sid3, d3, _ = t.stage_append(spark.createDataFrame([("d", 4)], "k string, v int"))
    t.append(spark.createDataFrame([("e", 5)], "k string, v int"))
    with _pytest.raises(RuntimeError, match="stale staged append"):
        t.commit_append(sid3, d3)


import pytest  # noqa: E402

from etherscan_contract_crawler_spark.storage.iceberg_backend import (  # noqa: E402
    IcebergTable,
    iceberg_available,
)


@pytest.fixture(params=["snapshot", "iceberg"])
def make_table(request, spark, tmp_path):
    """One factory per backend; the Iceberg leg runs whenever the runtime
    jars + a 'local' catalog are present (r1 VERDICT #4: interface tests
    parametrized over both backends, cleanly skipped with reason here)."""
    if request.param == "snapshot":
        def mk(name, ddl):
            t = SnapshotTable(str(tmp_path / name))
            t.create(ddl)
            return t

        return mk
    ok, reason = iceberg_available(spark)
    if not ok:
        pytest.skip(f"iceberg backend unavailable in this environment: {reason}")

    def mk(name, ddl):
        t = IcebergTable(spark, f"local.crawl.{name}")
        t.create(ddl)
        return t

    return mk


def test_backend_interface_contract(make_table, spark):
    """The engine's entire storage surface, exercised through the shared
    interface: append with lineage, idempotent MERGE-not-matched, lineage
    accumulation, time travel by snapshot id."""
    t = make_table("iface", "k string, v int")
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    sid1 = t.append(df1, lineage={"epoch": 0, "x": 1})
    assert t.read(spark).count() == 2

    df2 = spark.createDataFrame([("b", 9), ("c", 3)], "k string, v int")
    _, n = t.merge_not_matched(df2, ["k"], lineage={"epoch": 1})
    assert n == 1
    _, n_replay = t.merge_not_matched(df2, ["k"])
    assert n_replay == 0  # idempotent replay

    lin = t.lineage()
    assert lin["epoch"] == 1 and lin["x"] == 1  # accumulates across commits
    assert t.read(spark).count() == 3
    assert t.read(spark, version=sid1).count() == 2  # time travel
