"""SnapshotTable: commits, MERGE idempotency, time travel, lineage."""

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
