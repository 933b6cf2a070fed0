"""Corpus-curation operators a large-scale training pipeline runs beyond
dedup: eval-set decontamination, PII scrubbing, and domain-mix sampling.

All three are dual-dialect (Spark + DuckDB oracle) over the stored
``documents`` table — value-hash checked, not rows-only. They complete the
training-data battery of COVERAGE.md alongside the dedup family
(textops.py) and the image curation battery (multimodal.py).

Scale notes per operator live in their docstrings; the common theme is
that each has a side that is SMALL by construction (the eval set, the
pattern list, the per-stratum quota table) so the plan broadcasts it and
the big side streams through map-side — no all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register
from .textops import _docs_view

# the "benchmark/eval set" is deterministic AND fixed-size: ids on the
# mod-29 residue, capped at _BENCH_MAX docs — a real eval set does not
# grow with the corpus, and the cap is what makes the broadcast of its
# n-gram list valid at ANY corpus scale (at the test sfs the cap is not
# binding, so it changes no oracle row)
_BENCH_MOD = 29
_BENCH_MAX = 2000 * 29  # doc_id ceiling => <= 2000 bench docs forever
_NGRAM = 5


def _ngrams_sql(dialect: str, src: str, where: str) -> str:
    """Word {_NGRAM}-grams per doc, per dialect. Spark: transform over a
    sequence of start offsets + slice/array_join (native, codegen'd).
    DuckDB: list comprehension over 1-based inclusive slices."""
    n = _NGRAM
    if dialect == "spark":
        # split() is hoisted into a subquery: inside the transform lambda
        # it would re-tokenize the full text at every start offset
        # (O(words^2) per doc — HOF lambdas get no per-row CSE)
        return f"""
          SELECT doc_id,
                 explode(transform(
                   sequence(1, greatest(size(w) - {n - 1}, 1)),
                   i -> array_join(slice(w, i, {n}), ' '))) AS ngram
          FROM (SELECT doc_id, split(text, ' ') AS w FROM {src} WHERE {where})
        """.strip()
    return f"""
      SELECT doc_id,
             unnest([array_to_string(w[CAST(i AS INT):CAST(i + {n - 1} AS INT)], ' ')
                     for i in range(1, greatest(len(w) - {n - 1}, 1) + 1)]) AS ngram
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {src} WHERE {where})
    """.strip()


def _decon_sql(dialect: str, src: str = "documents") -> str:
    bench_where = f"doc_id % {_BENCH_MOD} = 0 AND doc_id < {_BENCH_MAX}"
    bench = _ngrams_sql(dialect, src, bench_where)
    train = _ngrams_sql(dialect, src, f"NOT ({bench_where})")
    return f"""
      WITH bench AS (SELECT DISTINCT doc_id, ngram FROM ({bench}) b),
      train AS (SELECT DISTINCT doc_id, ngram FROM ({train}) t)
      SELECT train.doc_id AS train_doc, bench.doc_id AS bench_doc,
             count(*) AS n_shared_ngrams
      FROM train JOIN bench ON train.ngram = bench.ngram
      GROUP BY train.doc_id, bench.doc_id
    """


@register(
    "decon_ngram_overlap",
    _decon_sql("duckdb"),
    f"Eval-set decontamination: flag every training doc sharing a word "
    f"{_NGRAM}-gram with the deterministic FIXED-SIZE benchmark slice "
    f"(mod-{_BENCH_MOD} residue capped at 2000 docs), with the "
    f"shared-ngram count per (train, bench) pair. The bench side is "
    f"small by construction — the real-world shape: eval sets are ~10^4 "
    f"docs next to a 10^10-doc corpus, so its distinct n-gram list "
    f"broadcasts and the corpus streams through a map-side hash join; "
    f"n-grams are deduped per doc BEFORE the join so a repeated phrase "
    f"cannot fan out. No all-pairs stage",
)
def decon_ngram_overlap(spark: SparkSession, sf: str) -> DataFrame:
    v = _docs_view(spark, sf, "v_decon_docs")
    bench_where = f"doc_id % {_BENCH_MOD} = 0 AND doc_id < {_BENCH_MAX}"
    # the bench n-gram list is the small side — bounded by the _BENCH_MAX
    # cap at any corpus scale — so the broadcast is explicit rather than
    # trusting the size estimate of a post-aggregate subtree
    bench = spark.sql(
        "SELECT DISTINCT doc_id AS bench_doc, ngram FROM ("
        + _ngrams_sql("spark", v, bench_where)
        + ") b"
    )
    train = spark.sql(
        "SELECT DISTINCT doc_id AS train_doc, ngram FROM ("
        + _ngrams_sql("spark", v, f"NOT ({bench_where})")
        + ") t"
    )
    return (
        train.join(F.broadcast(bench), "ngram")
        .groupBy("train_doc", "bench_doc")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


# deterministic synthetic PII, appended identically on both engines — the
# stored corpus has none (it is word salad), and fabricating it in the
# projection keeps the scrub machinery (patterns, global replace, audit
# counts) real while the inputs stay reproducible; the images battery does
# the same for pixels
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_RE = "555-[0-9]{4}"


def _pii_aug_sql() -> str:
    # identical string expression in both dialects ('||' concat, % modulo)
    return (
        "text || ' contact: user' || doc_id || '@mail' || (doc_id % 7) "
        "|| '.example.com or call 555-' || (1000 + doc_id % 9000)"
    )


def _pii_sql(dialect: str, src: str = "documents") -> str:
    aug = _pii_aug_sql()
    if dialect == "spark":
        return f"""
          SELECT doc_id,
                 size(regexp_extract_all(aug, '{_EMAIL_RE}', 0)) AS n_emails,
                 size(regexp_extract_all(aug, '{_PHONE_RE}', 0)) AS n_phones,
                 md5(regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>'),
                                    '{_PHONE_RE}', '<PHONE>')) AS scrubbed_md5
          FROM (SELECT doc_id, {aug} AS aug FROM {src})
        """
    return f"""
      SELECT doc_id,
             len(regexp_extract_all(aug, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(aug, '{_PHONE_RE}')) AS n_phones,
             md5(regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
      FROM (SELECT doc_id, {aug} AS aug FROM {src})
    """


@register(
    "curation_pii_scrub",
    _pii_sql("duckdb"),
    "PII scrubbing with an audit trail: global regex redaction of email "
    "and phone patterns plus per-doc match counts; the md5 of the scrubbed "
    "text is value-checked so the oracle proves the REPLACEMENT, not just "
    "the counts. Pure native SQL (JVM regex, whole-stage codegen) — "
    "map-side only, no shuffle, embarrassingly parallel at any corpus "
    "size. PII is synthesized deterministically into the projection "
    "because the stored corpus has none (same pattern as the image "
    "battery's generated pixels)",
)
def curation_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    v = _docs_view(spark, sf, "v_pii_docs")
    return spark.sql(_pii_sql("spark", v))


# target mix: fraction of each language stratum to keep (deterministic
# prefix by doc_id). A real pipeline reweights sources the same way; the
# quota table is a handful of rows and lives in the expression itself.
_MIX = {"en": 0.5, "de": 0.3}
_MIX_DEFAULT = 0.25


def _mix_case() -> str:
    whens = " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in _MIX.items())
    return f"CASE {whens} ELSE {_MIX_DEFAULT} END"


def _mix_sql(dialect: str, src: str = "documents") -> str:
    # ceiling() in Spark, ceil() in DuckDB; everything else is shared
    ceil_fn = "ceiling" if dialect == "spark" else "ceil"
    return f"""
      WITH ranked AS (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n_lang
        FROM {src})
      SELECT doc_id, lang, source, rn, n_lang
      FROM ranked
      WHERE rn <= {ceil_fn}(({_mix_case()}) * n_lang)
    """


@register(
    "curation_domain_mix",
    _mix_sql("duckdb"),
    "Domain/language mix sampling: keep a deterministic per-stratum "
    "fraction (en 50%, de 30%, rest 25%) selected by rank within each "
    "language — the data-mixing step that turns raw corpus proportions "
    "into training proportions, reproducibly (no RNG: rank-prefix "
    "selection gives the same sample on every run and engine). One "
    "window over the stratum key; at corpus scale each stratum is one "
    "partition group of a hash exchange, quotas are expression constants",
)
def curation_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    v = _docs_view(spark, sf, "v_mix_docs")
    return spark.sql(_mix_sql("spark", v))
