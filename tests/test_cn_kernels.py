"""Golden-dict unit tests for the ported numeric kernels, in the style of the
reference's test_getCoordination.py (17 cases asserting exact CN dicts like
{'Li': 4, 'O': 8}). SURVEY.md §5 calls for exactly this shape for the A7 mode
tie-break, the A8 weighted average, the A9/A9b Hoppe ECoN math, and (round 3)
the A17 O'Keeffe max-normalized CN. Expected values come from an independent
pure-python twin of each reference formula, written against the published
math — never from running the Spark code first.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mongodb_postproc_spark.operators.relational import econ_two_stage, mode_per_group


def _bonds_df(spark, groups: dict[str, list[float]]):
    rows = [(k, float(v)) for k, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "site string, bond double")


# ---------------------------------------------------------------- A7 mode
def test_mode_tiebreak_lowest_wins(spark):
    """scipy.stats.mode returns the SMALLEST of equally-frequent values
    (getCoordination.py:42 mode(...)[0][0]); {'A': 4, 'B': 8} is golden."""
    df = spark.createDataFrame(
        [("A", 6.0), ("A", 4.0), ("A", 6.0), ("A", 4.0), ("A", 9.0), ("B", 8.0), ("B", 8.0), ("B", 2.0)],
        "site string, cn double",
    )
    got = {r["site"]: (r["mode_cn"], r["mode_count"]) for r in mode_per_group(df, "site", "cn").collect()}
    assert got == {"A": (4.0, 2), "B": (8.0, 2)}


# ---------------------------------------------------------------- A8 weighted avg
def test_cation_weighted_average(spark):
    """get_cation_weighted_avg arithmetic (getCoordination.py:60-70):
    sum(amount * cn) / sum(amount). Li2O-shaped golden: amounts {Li: 2, O: 1},
    cations only -> (2*4.0)/2 = 4.0; with a second cation {Zn: 1, cn 6.5}:
    (2*4.0 + 1*6.5)/3 = 4.833333..."""
    df = spark.createDataFrame(
        [("s1", 2.0, 4.0), ("s1", 1.0, 6.5), ("s2", 3.0, 8.0)],
        "structure string, amt double, cn double",
    )
    got = {
        r["structure"]: r["wavg"]
        for r in df.groupBy("structure")
        .agg((F.sum(F.col("amt") * F.col("cn")) / F.sum("amt")).alias("wavg"))
        .collect()
    }
    assert got["s1"] == pytest.approx((2 * 4.0 + 1 * 6.5) / 3, abs=1e-12)
    assert got["s2"] == pytest.approx(8.0, abs=1e-12)


# ---------------------------------------------------------------- A9/A9b ECoN
def _econ_two_stage_py(bonds: list[float]) -> float:
    """Independent twin of the reference's EffectiveCoordFinder math
    (getCoordination.py:100-114 calculate_weighted_avg + :152-161 reweight):
    l_av = sum(l*exp(1-(l/l_min)^6))/sum(exp(1-(l/l_min)^6));
    ECoN = sum(round(exp(1-(l/l_av)^6), 3))."""
    l_min = min(bonds)
    num = sum(b * math.exp(1 - (b / l_min) ** 6) for b in bonds)
    den = sum(math.exp(1 - (b / l_min) ** 6) for b in bonds)
    l_av = num / den
    return sum(round(math.exp(1 - (b / l_av) ** 6), 3) for b in bonds)


GOLDEN_POLYHEDRA = {
    # regular octahedron: six equal bonds -> every weight exp(1-1)=1 -> ECoN 6
    "octahedron": [2.0] * 6,
    # distorted tetrahedron
    "tetra_distorted": [1.9, 2.0, 2.0, 2.3],
    # 4+2 Jahn-Teller-like: the two long bonds get tiny weights
    "jahn_teller": [2.0, 2.0, 2.0, 2.0, 2.6, 2.6],
    # one dominant short bond suppresses the rest
    "one_short": [1.5, 2.4, 2.5, 2.6],
}


def test_econ_two_stage_golden(spark):
    df = _bonds_df(spark, GOLDEN_POLYHEDRA)
    got = {r["site"]: r["econ2"] for r in econ_two_stage(df, "site", "bond").collect()}
    for site, bonds in GOLDEN_POLYHEDRA.items():
        assert got[site] == pytest.approx(_econ_two_stage_py(bonds), abs=1e-6), site
    # structural facts the math must reproduce
    assert got["octahedron"] == pytest.approx(6.0, abs=1e-9)
    assert 3.0 < got["tetra_distorted"] < 4.0
    assert 4.0 < got["jahn_teller"] < 6.0  # long bonds nearly vanish
    assert 1.0 <= got["one_short"] < 2.5  # long bonds round to weight 0.000


def test_econ_single_stage_golden(spark):
    """A9's single-stage form: weights against l_min directly
    (getCoordination.py:137-141 uses the same exp(1-(l/l_min)^6) kernel)."""
    bonds = [2.0, 2.0, 2.1, 2.2]
    df = _bonds_df(spark, {"s": bonds})
    l_min = F.min("bond").over(Window.partitionBy("site"))
    w = F.exp(1 - F.pow(F.col("bond") / l_min, 6))
    got = df.select(w.alias("w")).agg(F.sum("w")).collect()[0][0]
    expect = sum(math.exp(1 - (b / min(bonds)) ** 6) for b in bonds)
    assert got == pytest.approx(expect, abs=1e-9)


# ---------------------------------------------------------------- A17 O'Keeffe
def test_okeeffe_max_normalized_golden(spark):
    """O'Keeffe CN: weights normalized by the largest (analysePauling.py:181
    okeeffe_get_avg_cn; O'Keeffe 1979 largest-solid-angle normalization).
    [10,5,5] -> 1+0.5+0.5 = 2.0 exactly; six equal weights -> 6.0."""
    groups = {"g1": [10.0, 5.0, 5.0], "g2": [3.0] * 6, "g3": [8.0, 6.0, 4.0, 2.0]}
    df = _bonds_df(spark, groups)
    w = Window.partitionBy("site")
    got = {
        r["site"]: r["cn"]
        for r in df.withColumn("mx", F.max("bond").over(w))
        .groupBy("site")
        .agg(F.sum(F.col("bond") / F.col("mx")).alias("cn"))
        .collect()
    }
    assert got["g1"] == pytest.approx(2.0, abs=1e-12)
    assert got["g2"] == pytest.approx(6.0, abs=1e-12)
    assert got["g3"] == pytest.approx((8 + 6 + 4 + 2) / 8.0, abs=1e-12)
