"""Pauling-file-shaped `records` battery: payload repair (U3), hp/ht
tagging + dataset pipeline (§3.2), and the HTML-section map parse (S20).

The reference's flagship lifecycle operates on its `pauling_file*`
collections (FIXTURES.md §3): a CIF-like text payload per record that may
need the repair battery (/root/reference/cifEditor.py:11-135), title/phase
regex tagging (/root/reference/analysePauling.py:51-84, golden-specced by
/root/reference/test_hpht_tags.py:11-57), per-composition intersection
dataset flags (/root/reference/analysePauling.py:115-130), and the
section→dict webpage parse (/root/reference/parse_Pauling.py:15-48).

The driver's DuckDB gate only pre-registers the ten sf* tables, so the
records table is GENERATED deterministically from `documents.doc_id` by a
dialect-parametrized SQL fragment rendered identically for Spark and
DuckDB (integer arithmetic + string concat only — no float formatting, no
RNG, so the two engines build byte-identical records). The Spark side then
runs the real operators (repair UDF chain, regex tagging, map_from_entries
parse); the oracle side checks them against closed-form golden
expectations derived from the same arithmetic — the reference's own
golden-dict test style at table scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.repair import repair_chain
from .base import load, register

MAX_DOC = 2400  # bound the battery at sf0.1 scale


def _records_cte(d: str) -> str:
    """The records generation, rendered for ``d`` in {'spark', 'duckdb'}.

    Columns: doc_id, key, composition, title, phase_labels, temperature
    (nullable expdetails value), payload (CIF-like, malformed for
    doc_id%4==0: an expandable quoted multi-element label for %8==0, an
    unexpandable '?'-occupancy row for %8==4), webpage (sectioned
    key:/value text for the S20 parse).
    """
    s = "STRING" if d == "spark" else "VARCHAR"

    def c(e: str) -> str:
        return f"CAST({e} AS {s})"

    nl = "chr(10)"
    comp = f"'C' || {c('doc_id % 50')}"
    pres = f"{c('(doc_id * 13) % 40')} || '.' || {c('doc_id % 10')}"
    temp_txt = f"'T = ' || {c('200 + (doc_id * 37) % 400')} || '(1) K'"
    site = "' 0.1 0.2 0.3 1.0'"
    payload = f"""
        'data_sd_' || {c('doc_id')}
        || {nl} || '_cell_length_a 5.' || {c('doc_id % 90')}
        || {nl} || 'loop_'
        || {nl} || '_atom_site_label'
        || {nl} || '_atom_site_occupancy'
        || {nl} || 'El0' || {site}
        || {nl} || 'El1' || {site}
        || CASE WHEN doc_id % 3 >= 1 THEN {nl} || 'El2' || {site} ELSE '' END
        || CASE WHEN doc_id % 3 = 2 THEN {nl} || 'El3' || {site} ELSE '' END
        || CASE WHEN doc_id % 8 = 0
                THEN {nl} || '''Fe 0.3 + Ni 0.6'' 0.1 0.2 0.3 ?'
                WHEN doc_id % 8 = 4 THEN {nl} || 'Zr 0.1 0.2 0.3 ?'
                ELSE '' END
    """
    phase = f"{comp} || CASE WHEN doc_id % 5 = 0 THEN '-a hp' ELSE '-a' END"
    title = f"""
        CASE WHEN doc_id % 7 = 0
               THEN 'Structure of ' || {comp} || ', p = ' || {pres} || '(2) GPa study'
             WHEN doc_id % 7 = 1 THEN 'Structure of ' || {comp} || ' hp phase'
             ELSE 'Structure of ' || {comp} END
    """
    temperature = f"CASE WHEN doc_id % 3 = 0 THEN NULL ELSE {temp_txt} END"
    webpage = f"""
        'General Information'
        || {nl} || 'Phase Label(s):' || {nl} || ({phase})
        || {nl} || 'Space Group:' || {nl} || 'P' || {c('doc_id % 230 + 1')}
        || {nl} || 'Density:' || {nl} || {c('3 + doc_id % 5')} || '.'
        || {c('doc_id % 10')} || ' g/cm3'
        || {nl} || 'Experimental Details'
        || CASE WHEN doc_id % 3 = 0 THEN ''
                ELSE {nl} || 'temperature:' || {nl} || ({temp_txt}) END
    """
    return f"""
        SELECT doc_id,
               'sd_' || {c('doc_id')} AS key,
               {comp} AS composition,
               ({title}) AS title,
               ({phase}) AS phase_labels,
               ({temperature}) AS temperature,
               ({payload}) AS payload,
               ({webpage}) AS webpage
        FROM documents WHERE doc_id < {MAX_DOC}
    """


def _rec_view(spark: SparkSession, sf: str, name: str = "v_records") -> str:
    # deliberately NOT spread across cores (contrast
    # textops._docs_view_parallel): the battery is capped at MAX_DOC=2400
    # rows and the repair kernel measures ~0.07 s for the whole table, so a
    # forced repartition would only multiply python-worker startup and Arrow
    # round-trip overhead (measured 24 s cold / 2.3 s warm at 32 tasks vs
    # 2.3 s warm at 1). At real corpus scale the parquet input arrives with
    # thousands of natural splits and mapInPandas inherits them.
    load(spark, sf, "documents").createOrReplaceTempView("documents")
    spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {_records_cte('spark')}")
    return name


# ---------------------------------------------------------------------------
# U3: payload repair chain (attempt1 -> parse check -> attempt2 -> coalesce)
# ---------------------------------------------------------------------------


def _repair_batches(batches):
    for pdf in batches:
        pairs = [repair_chain(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "key": pdf["key"],
                "repaired": [p[0] for p in pairs],
                "attempt_used": [p[1] for p in pairs],
            }
        )


@register(
    "u3_payload_repair_chain",
    f"""
    WITH rec AS ({_records_cte('duckdb')})
    SELECT key,
           CASE WHEN doc_id % 4 <> 0 THEN 0
                WHEN doc_id % 8 = 0 THEN 1 ELSE 2 END AS attempt_used,
           CAST(2 + doc_id % 3 + CASE WHEN doc_id % 8 = 0 THEN 2 ELSE 0 END
                AS BIGINT) AS n_sites,
           round(CAST(2 + doc_id % 3 + CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END
                      AS DOUBLE), 4) AS occ_sum
    FROM rec
    """,
    "U3 payload repair battery (cifEditor.py:11-135 semantics): malformed "
    "quoted-label site rows expanded with occupancy renormalization "
    "(attempt 1), unfixable rows commented out (attempt 2, "
    "cifEditor.py:60-85 fallback), coalesced by parse-check; the repaired "
    "payload is re-parsed NATIVELY (explode lines -> site filter -> agg) "
    "and gated against closed-form golden expectations",
)
def u3_payload_repair_chain(spark: SparkSession, sf: str) -> DataFrame:
    v = _rec_view(spark, sf)
    rep = (
        spark.table(v)
        .select("key", "payload")
        .mapInPandas(_repair_batches, "key string, repaired string, attempt_used int")
    )
    lines = rep.select(
        "key", "attempt_used", F.explode(F.split("repaired", "\n")).alias("line")
    )
    fields = F.split(F.trim("line"), " +")
    occ = F.element_at(fields, 5).try_cast("double")
    sites = lines.filter(
        (~F.col("line").startswith("#")) & (F.size(fields) == 5) & occ.isNotNull()
    )
    return sites.groupBy("key", "attempt_used").agg(
        F.count("*").alias("n_sites"),
        F.round(F.sum(occ), 4).alias("occ_sum"),
    ).select("key", "attempt_used", "n_sites", "occ_sum")


# ---------------------------------------------------------------------------
# §3.2: hp/ht regex tagging + per-composition intersection dataset flags
# ---------------------------------------------------------------------------


def _tags_cte(d: str, rec: str) -> str:
    """Tri-state is_hp / is_ht per analysePauling.py:51-84: pressure parsed
    from 'p = X.X(e) GPa' in the title (> 1 atm -> True), else ' hp' in
    title/phase; temperature parsed from 'T = NNN(e) K' (>450 K True,
    <350 K False, else NULL; missing -> NULL)."""
    paren = r"\\(.*\\)" if d == "spark" else r"\(.*\)"
    ws = r"\\s" if d == "spark" else r"\s"
    pres_val = (
        f"CAST(trim(regexp_replace(regexp_extract(title, 'p = (.*) GPa', 1), "
        f"'{paren}', '')) AS DOUBLE)"
    )
    temp_val = (
        f"CAST(trim(regexp_replace(regexp_extract(temperature, "
        f"'T{ws}*={ws}*(.*){ws}*K', 1), '{paren}', '')) AS DOUBLE)"
    )
    return f"""
        SELECT key, composition,
               CASE WHEN title LIKE '%p =%' THEN round({pres_val}, 4)
                    ELSE NULL END AS pressure_gpa,
               CASE WHEN temperature IS NULL THEN NULL
                    ELSE round({temp_val}, 4) END AS temp_k,
               CASE WHEN title LIKE '%p =%' THEN {pres_val} > 0.00010132501
                    WHEN title LIKE '% hp%' OR phase_labels LIKE '% hp%' THEN TRUE
                    ELSE FALSE END AS is_hp,
               CASE WHEN temperature IS NULL THEN NULL
                    WHEN {temp_val} > 450 THEN TRUE
                    WHEN {temp_val} < 350 THEN FALSE
                    ELSE NULL END AS is_ht
        FROM {rec}
    """


@register(
    "pipeline_hpht_tags",
    f"""
    WITH rec AS ({_records_cte('duckdb')})
    {_tags_cte('duckdb', 'rec')}
    """,
    "F1-F3 regex tagging battery over records (analysePauling.py:51-84; "
    "golden spec test_hpht_tags.py:11-57): tri-state booleans P5 + numeric "
    "extraction — Spark and DuckDB run the same tagging on the same "
    "generated records",
)
def pipeline_hpht_tags(spark: SparkSession, sf: str) -> DataFrame:
    v = _rec_view(spark, sf)
    return spark.sql(_tags_cte("spark", v))


def _dataset_sql(d: str, rec: str) -> str:
    """set_hpht_dataset_tags (analysePauling.py:115-130): a composition is
    an hp-dataset iff it has BOTH an is_hp=True and an is_hp=False record
    among records with is_ht in (False, NULL); ht-dataset analogously among
    is_hp=False records; member records then get the flag (ht additionally
    requires is_ht IS NOT NULL)."""
    return f"""
        WITH rec AS ({rec}),
        t AS ({_tags_cte(d, 'rec')}),
        hp_ds AS (
          SELECT DISTINCT composition FROM t WHERE is_hp AND is_ht IS DISTINCT FROM TRUE
          INTERSECT
          SELECT DISTINCT composition FROM t WHERE NOT is_hp AND is_ht IS DISTINCT FROM TRUE),
        ht_ds AS (
          SELECT DISTINCT composition FROM t WHERE is_ht AND NOT is_hp
          INTERSECT
          SELECT DISTINCT composition FROM t WHERE NOT is_ht AND NOT is_hp)
        SELECT t.key, t.composition, t.is_hp, t.is_ht,
               (hp.composition IS NOT NULL AND t.is_ht IS DISTINCT FROM TRUE)
                 AS is_hp_dataset,
               (ht.composition IS NOT NULL AND NOT t.is_hp AND t.is_ht IS NOT NULL)
                 AS is_ht_dataset
        FROM t
        LEFT JOIN hp_ds hp ON t.composition = hp.composition
        LEFT JOIN ht_ds ht ON t.composition = ht.composition
    """


@register(
    "pipeline_hpht_dataset_tags",
    _dataset_sql("duckdb", _records_cte("duckdb")),
    "The reference's flagship composed lifecycle (§3.2, "
    "analysePauling.py:402-430): CTAS records -> regex hp/ht tagging -> "
    "per-composition bool aggregation -> set intersection -> per-record "
    "dataset flags (the MERGE step is exercised through "
    "TableCatalog.merge_upsert in tests/test_hpht_pipeline.py). Joins "
    "against the two tiny intersection sets broadcast",
)
def pipeline_hpht_dataset_tags(spark: SparkSession, sf: str) -> DataFrame:
    _rec_view(spark, sf)
    return spark.sql(_dataset_sql("spark", _records_cte("spark")))


# ---------------------------------------------------------------------------
# S20: sectioned webpage -> map<string,string> parse
# ---------------------------------------------------------------------------


@register(
    "s20_section_parse_map",
    f"""
    WITH rec AS ({_records_cte('duckdb')})
    SELECT key, 'Phase Label(s)' AS section_key, phase_labels AS section_value FROM rec
    UNION ALL
    SELECT key, 'Space Group', 'P' || CAST(doc_id % 230 + 1 AS VARCHAR) FROM rec
    UNION ALL
    SELECT key, 'Density',
           CAST(3 + doc_id % 5 AS VARCHAR) || '.' || CAST(doc_id % 10 AS VARCHAR)
           || ' g/cm3' FROM rec
    UNION ALL
    SELECT key, 'temperature', temperature FROM rec WHERE temperature IS NOT NULL
    """,
    "S20 HTML-section parse (parse_Pauling.py:15-48): 'Key:' lines paired "
    "with their following line into a map<string,string> via "
    "transform+filter+map_from_entries (section headers drop out), then "
    "exploded to scalar rows for the oracle compare — golden rows derive "
    "from the generation arithmetic",
)
def s20_section_parse_map(spark: SparkSession, sf: str) -> DataFrame:
    v = _rec_view(spark, sf)
    return spark.sql(f"""
        WITH l AS (SELECT key, split(webpage, '\\n') AS lines FROM {v}),
        m AS (
          SELECT key,
                 map_from_entries(filter(
                   transform(sequence(0, size(lines) - 2),
                             i -> CASE WHEN endswith(lines[i], ':')
                                       THEN named_struct(
                                              'k', substring(lines[i], 1,
                                                             length(lines[i]) - 1),
                                              'v', lines[i + 1])
                                       END),
                   e -> e IS NOT NULL)) AS sections
          FROM l)
        SELECT key, section_key, section_value
        FROM m LATERAL VIEW explode(sections) s AS section_key, section_value
    """)
