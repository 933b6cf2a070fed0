import pandas as pd
import pytest
from pyspark.sql import functions as F

from mongodb_postproc_spark.operators import mutations as M


@pytest.fixture()
def df(spark):
    pdf = pd.DataFrame(
        {
            "key": ["a", "b", "c"],
            "cif": ["old-a", "old-b", None],
            "errors": [["e1"], None, ["e1", "e2"]],
        }
    )
    return spark.createDataFrame(
        pdf, "key string, cif string, errors array<string>"
    )


def test_add_to_set_no_duplicates(spark, df):
    out = M.add_to_set(df, "errors", F.lit("e1"))
    got = {r["key"]: r["errors"] for r in out.collect()}
    assert got == {"a": ["e1"], "b": ["e1"], "c": ["e1", "e2"]}


def test_rename_field_backs_up(spark, df):
    out = M.rename_field(df, "cif", "cif_old")
    r = {x["key"]: (x["cif"], x["cif_old"]) for x in out.collect()}
    assert r["a"] == (None, "old-a") and r["c"] == (None, None)


def test_unset_field(spark, df):
    out = M.unset_field(df, "cif")
    assert all(r["cif"] is None for r in out.collect())


def test_delete_by_keys(spark, df):
    keys = spark.createDataFrame(pd.DataFrame({"key": ["b"]}))
    out = M.delete_by_keys(df, "key", keys)
    assert {r["key"] for r in out.collect()} == {"a", "c"}


def test_assert_unique_key(spark, df):
    M.assert_unique_key(df, "key")
    dup = df.union(df)
    with pytest.raises(ValueError):
        M.assert_unique_key(dup, "key")


def test_set_fields_multi(spark, df):
    out = M.set_fields(df, {"is_hp_dataset": F.lit(False), "n": F.lit(1)})
    assert out.filter(~F.col("is_hp_dataset")).count() == 3
