"""BENCH_DEDUP_SOAK.json's derived numbers follow from its raw measurements.

Same self-consistency guarantee as the other bench artifacts: the growth
exponents and per-output-row costs in the committed soak artifact must be
exactly recomputable from the raw (seconds, result_rows) tables beside
them, and the claimed linearity must actually hold in the recorded data —
so the artifact cannot drift from what was measured.
"""

import json
import math
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "BENCH_DEDUP_SOAK.json")


@pytest.mark.skipif(not os.path.exists(ARTIFACT), reason="artifact not recorded yet")
def test_soak_artifact_derivations_and_linearity():
    with open(ARTIFACT) as f:
        art = json.load(f)
    sizes = art["sizes"]
    lo, hi = str(sizes[0]), str(sizes[-1])
    assert sizes[-1] >= 10 * sizes[0], "soak span must cover >=10x rows"
    for q, secs in art["seconds"].items():
        rows = art["result_rows"][q]
        exp = round(
            math.log(secs[hi] / secs[lo]) / math.log(int(hi) / int(lo)), 3
        )
        assert art["growth_exponent_lo_to_hi"][q] == exp, q
        for n in map(str, sizes):
            us = round(secs[n] / max(rows[n], 1) * 1e6, 1)
            assert art["us_per_result_row"][q][n] == us, (q, n)
        # the claim under test: banded designs grow ~linearly in rows over
        # the full 10x span — far below the all-pairs exponent 2
        assert exp < 1.3, f"{q}: lo->hi growth exponent {exp} is not ~linear"
        # and the output itself is ~linear in corpus size (bounded planted
        # clusters + dissimilar random pairs), so cost ~ candidates holds
        out_exp = math.log(rows[hi] / rows[lo]) / math.log(int(hi) / int(lo))
        assert out_exp < 1.3, f"{q}: output rows grew superlinearly ({out_exp:.2f})"
    assert art["commit"], "artifact missing commit stamp"
