import pandas as pd

from mongodb_postproc_spark.tables import TableCatalog


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame({"key": rows, "v": [x * 10 for x in rows]}),
                                 "key int, v int")


def test_snapshot_append_and_time_travel(spark, tmp_path):
    cat = TableCatalog(str(tmp_path))
    s0 = cat.create_or_replace("t", _df(spark, [1, 2]))
    s1 = cat.append("t", _df(spark, [3]))
    assert {r["key"] for r in cat.read("t", spark).collect()} == {1, 2, 3}
    assert {r["key"] for r in cat.read("t", spark, snapshot=s0).collect()} == {1, 2}
    s2 = cat.create_or_replace("t", _df(spark, [9]))
    assert {r["key"] for r in cat.read("t", spark).collect()} == {9}
    assert {r["key"] for r in cat.read("t", spark, snapshot=s1).collect()} == {1, 2, 3}
    assert [s["id"] for s in cat.snapshots("t")] == [s0, s1, s2]


def test_merge_upsert(spark, tmp_path):
    cat = TableCatalog(str(tmp_path))
    cat.create_or_replace("t", _df(spark, [1, 2, 3]))
    src = spark.createDataFrame(pd.DataFrame({"key": [2, 4], "v": [999, 888]}), "key int, v int")
    cat.merge_upsert("t", src, "key")
    got = {r["key"]: r["v"] for r in cat.read("t", spark).collect()}
    assert got == {1: 10, 2: 999, 3: 30, 4: 888}
