"""Golden-string tests of the U3 repair chain (functions/repair.py) — the
style of the reference's own unit specs (test_hpht_tags.py golden dicts),
applied to the cifEditor repair semantics. Pure python: no Spark session."""

from mongodb_postproc_spark.functions.repair import (
    parse_ok,
    repair_attempt1,
    repair_attempt2,
    repair_chain,
)

CLEAN = """data_sd_1
_cell_length_a 5.1
loop_
_atom_site_label
_atom_site_occupancy
El0 0.1 0.2 0.3 1.0
El1 0.1 0.2 0.3 1.0"""

EXPANDABLE = CLEAN + "\n'Fe 0.3 + Ni 0.6' 0.1 0.2 0.3 ?"

UNFIXABLE = CLEAN + "\nZr 0.1 0.2 0.3 ?"


def test_parse_ok():
    assert parse_ok(CLEAN)
    assert not parse_ok(EXPANDABLE)
    assert not parse_ok(UNFIXABLE)


def test_attempt1_expands_and_renormalizes():
    out = repair_attempt1(EXPANDABLE)
    lines = out.splitlines()
    assert "#'Fe 0.3 + Ni 0.6' 0.1 0.2 0.3 ?" in lines
    assert "Fe 0.1 0.2 0.3 0.3" in lines
    # 0.3 + 0.6 != 1 -> last occupancy renormalized to 1 - 0.3 = 0.7
    assert "Ni 0.1 0.2 0.3 0.7" in lines
    assert parse_ok(out)


def test_attempt1_keeps_summing_occupancies():
    src = CLEAN + "\n'Cu 0.25 + Zn 0.75' 0.4 0.5 0.6 ?"
    lines = repair_attempt1(src).splitlines()
    assert "Cu 0.4 0.5 0.6 0.25" in lines
    assert "Zn 0.4 0.5 0.6 0.75" in lines


def test_attempt2_comments_unfixable_rows():
    out = repair_attempt2(UNFIXABLE)
    assert "#Zr 0.1 0.2 0.3 ?" in out.splitlines()
    assert parse_ok(out)


def test_chain_coalesce():
    assert repair_chain(CLEAN) == (CLEAN, 0)
    rep1, a1 = repair_chain(EXPANDABLE)
    assert a1 == 1 and parse_ok(rep1)
    rep2, a2 = repair_chain(UNFIXABLE)
    assert a2 == 2 and parse_ok(rep2)
    # attempt 2 drops the bad site but keeps the good ones
    good = [ln for ln in rep2.splitlines() if ln.startswith("El")]
    assert len(good) == 2
