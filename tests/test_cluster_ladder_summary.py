"""BENCH_SCALING_CLUSTER.json is the summary of its own embedded reps.

Same guarantee the other bench artifacts carry (tests/test_bench_consistency.py
for BENCH_SCALING.json and BENCH_BATTERY_r*.json): every pair number in the
committed multi-JVM ladder artifact must be recomputable from the per-rep
``runs`` records sitting beside it — nothing pasted, nothing stale. Plus a
synthetic-rep unit test of the pair math itself (efficiency estimators and
the t(N)=w/N+f fixed-cost fit).
"""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "BENCH_SCALING_CLUSTER.json")


def _load_summarizer():
    spec = importlib.util.spec_from_file_location(
        "summarize_cluster_ladder",
        os.path.join(REPO, "tools", "summarize_cluster_ladder.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pair_math_on_synthetic_reps():
    mod = _load_summarizer()
    # perfect 4x scaling with a 10 s fixed cost: t(2)=210, t(8)=60
    runs = {
        "local-cluster[2,1,3072]": [
            {"urls_per_sec": 100_000 / 210.0, "seconds": 210.0, "n_urls_fetched": 100_000},
            {"urls_per_sec": 100_000 / 220.0, "seconds": 220.0, "n_urls_fetched": 100_000},
        ],
        "local-cluster[8,1,3072]": [
            {"urls_per_sec": 100_000 / 60.0, "seconds": 60.0, "n_urls_fetched": 100_000},
            {"urls_per_sec": 100_000 / 62.0, "seconds": 62.0, "n_urls_fetched": 100_000},
        ],
    }
    pairs = mod.pairs_from_runs(runs)
    assert list(pairs) == ["2->8"]
    p = pairs["2->8"]
    # best-of efficiency = t2_min / (4 * t8_min)
    assert p["efficiency"] == round(210.0 / (4 * 60.0), 3)
    assert p["reps_N"] == 2 and p["reps_4N"] == 2
    # fit: w = (210-60)/(1/2-1/8) = 400, f = 210 - 400/2 = 10
    assert p["fit_scaling_work_sec"] == 400.0
    assert p["fit_fixed_sec_per_round"] == 10.0
    # per-row restatement: a = (w+f)/rows, s = f/rows
    assert p["fit_scalable_us_per_row"] == round(410.0 / 100_000 * 1e6, 1)
    assert p["fit_nonscaling_us_per_row"] == round(10.0 / 100_000 * 1e6, 1)


@pytest.mark.skipif(not os.path.exists(ARTIFACT), reason="artifact not recorded yet")
def test_artifact_is_summary_of_its_own_reps():
    mod = _load_summarizer()
    with open(ARTIFACT) as f:
        art = json.load(f)
    assert art["regimes"], "artifact has no regimes"
    for name, regime in art["regimes"].items():
        assert regime["runs"], f"{name}: no reps recorded"
        recomputed = mod.pairs_from_runs(regime["runs"])
        assert recomputed == regime["all_pairs"], (
            f"{name}: all_pairs is not the summary of its own runs"
        )
        # within a regime every leg crawled the identical deterministic web:
        # the fetched-URL count must agree across every rep of every leg
        fetched = {r["n_urls_fetched"] for rs in regime["runs"].values() for r in rs}
        assert len(fetched) == 1, f"{name}: fetched sets differ across legs {fetched}"
        assert regime["fetched_set_identical"] == sorted(fetched)
        # every rep carries its commit stamp and host probe
        for rs in regime["runs"].values():
            for r in rs:
                assert r.get("commit"), "rep missing commit stamp"
                assert r.get("probe_1p") is not None, "rep missing host probe"
