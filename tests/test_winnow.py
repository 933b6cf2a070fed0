"""Winnowing guarantee test: documents sharing a planted passage pair up,
unrelated documents don't.

The winnowing property (Schleimer et al. 2003): any substring of length
>= WINNOW_K + WINNOW_W - 1 shared by two documents contributes at least one
common selected fingerprint. A 200-char planted passage yields dozens, so
the WINNOW_MIN_SHARED=4 pair threshold must catch every planted pair, and
random unrelated text (no shared k-grams at all, distinct alphabets per
doc) must produce zero pairs.
"""

from __future__ import annotations

import random
import string

from mongodb_postproc_spark.operators.textops import (
    WINNOW_MIN_SHARED,
    _winnow_sql,
)

PASSAGE_LEN = 200


def _rand_text(rng, alphabet, n=400):
    return "".join(rng.choice(alphabet) for _ in range(n))


def _docs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("v_winnow_test")
    return "v_winnow_test"


def test_planted_passages_detected(spark):
    rng = random.Random(42)
    rows = []
    planted = []
    for i in range(3):
        # distinct alphabet slice per pair so pairs can't cross-match
        alpha = string.ascii_lowercase[i * 8 : i * 8 + 8]
        passage = _rand_text(rng, alpha, PASSAGE_LEN)
        a, b = 10 * i, 10 * i + 1
        rows.append((a, _rand_text(rng, alpha) + passage + _rand_text(rng, alpha)))
        rows.append((b, _rand_text(rng, alpha) + passage + _rand_text(rng, alpha)))
        planted.append((a, b))
    v = _docs(spark, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in spark.sql(_winnow_sql("spark", v)).collect()
    }
    for pair in planted:
        assert pair in got, f"planted pair {pair} not detected: {got}"
        assert got[pair] >= WINNOW_MIN_SHARED


def test_unrelated_docs_produce_no_pairs(spark):
    rng = random.Random(7)
    # digits vs uppercase vs mixed punctuation: zero shared 16-grams
    rows = [
        (1, _rand_text(rng, string.digits)),
        (2, _rand_text(rng, string.ascii_uppercase)),
        (3, _rand_text(rng, "!@#$%^&*()")),
    ]
    v = _docs(spark, rows)
    assert spark.sql(_winnow_sql("spark", v)).count() == 0
