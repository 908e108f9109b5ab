"""Eighteenth registry batch (round 12, second half): two curation
operators every large-scale training-data pipeline runs that the
registry did not yet cover — PII redaction and temperature-based
language sampling weights. Both all-native Column algebra (zero
Python), both hash-oracled.

`redact_pii_docs`: the shipped synthetic docs contain no PII, so —
the ext16/ext17 injection precedent — the query first plants
deterministic doc_id-derived PII spans (an email, an IPv4, a phone
fragment) on two thirds of the docs with IDENTICAL concat expressions
on both engines, then counts and redacts them with engine-portable
regexes (character classes + bounded quantifiers only: Java regex and
RE2 agree on these; no lookaround, no \\d shorthands whose Unicode
semantics differ). Output is per-doc match counts plus an md5
fingerprint of the redacted text, so the oracle hash proves the
REDACTED BYTES equal, not just the counts.

`lang_temperature_weights`: the standard multilingual-mix computation
(temperature/alpha sampling as in multilingual-BERT/XLM-R data
recipes): per-language token mass p_l, tempered sampling probability
q_l = p_l^alpha / sum(p^alpha) with alpha = 0.3, and the up/down-
sampling boost q_l / p_l. One tiny aggregate over the corpus — the
planner table a 100 TB multilingual run derives before writing its
sampler config.

Scale posture: redaction is a narrow per-row map with zero shuffle
(corpus-sized output → sortWithinPartitions only, per the r13
presentation-sort convention); the weights query is one groupBy(lang)
over ~10 groups with map-side partial aggregation.

Same contract rules as plans/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# Engine-portable PII patterns (Java regex == RE2 on this subset).
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
_PHONE = r"555-[0-9]{4}"


def _with_planted_pii(docs: DataFrame) -> DataFrame:
    """documents + `pii_text`: deterministic doc_id-derived PII spans
    planted on doc_id % 3 != 0 (the rest stay clean so zero-count rows
    are exercised). Pure concat — byte-identical to the SQL twin."""
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.org at 10.0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7 or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 != 0, planted)
        .otherwise(F.col("text"))
        .alias("pii_text"),
    )


def redact_pii_docs(spark: SparkSession, sf: str) -> DataFrame:
    d = _with_planted_pii(load_table(spark, sf, "documents"))
    t = F.col("pii_text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL, "<EMAIL>"), _IPV4, "<IP>"
        ),
        _PHONE,
        "<PHONE>",
    )
    return (
        d.select(
            "doc_id",
            F.regexp_count(t, F.lit(_EMAIL)).cast("long").alias("n_emails"),
            F.regexp_count(t, F.lit(_IPV4)).cast("long").alias("n_ipv4"),
            F.regexp_count(t, F.lit(_PHONE)).cast("long").alias("n_phones"),
            F.md5(redacted.cast("binary")).alias("redacted_fp"),
        )
        .sortWithinPartitions("doc_id")
    )


REDACT_PII_SQL = r"""
WITH planted AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 <> 0 THEN
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.org at 10.0.'
                    || CAST(doc_id % 250 AS VARCHAR)
                    || '.7 or 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE text END AS pii_text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(pii_text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(pii_text,
            '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(pii_text, '555-[0-9]{4}')) AS BIGINT)
           AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(pii_text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
            '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_fp
FROM planted
ORDER BY doc_id
"""


_ALPHA = 0.3
# Cross-engine hashed doubles sit on pow()/float-sum outputs, and Java
# Math.pow vs DuckDB's libm pow are not guaranteed identically rounded
# (r12 ADVICE item 3): a value landing within ~1 ulp of a rounding
# boundary could flip after a testdata regen. The flip probability is
# (cross-engine discrepancy)/(boundary spacing), so coarser rounding
# reduces it linearly — 4 decimals on probabilities / 2 on the boost
# is 100× safer than 6/4 and loses nothing a sampler config needs.
_P_DECIMALS = 4
_BOOST_DECIMALS = 2


def lang_temperature_weights(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf, "documents")
    # explicit ASCII class, NOT \s: Java \s includes \x0B, RE2's does
    # not — the ext17 engine-portability rule applies to token counts
    # feeding cross-engine-hashed doubles too
    toks = F.size(F.split(F.trim(F.col("text")), r"[ \t\r\n]+")).cast("long")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    # normalizers as GLOBAL WINDOWS over the aggregated frame: the
    # frame is O(languages) rows (the single partition holds ~10
    # rows, never the corpus), and the corpus is scanned ONCE — the
    # scalar-crossJoin formulation re-derived the groupBy three times
    # (6 scans in the executed plan).
    w = Window.partitionBy()
    p = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    per = per.withColumn("p", p).withColumn(
        "_q", F.sum(F.pow("p", F.lit(_ALPHA))).over(w)
    )
    return per.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round("p", _P_DECIMALS).alias("p_tokens"),
        F.round(F.pow("p", F.lit(_ALPHA)) / F.col("_q"), _P_DECIMALS).alias(
            "q_sample"
        ),
        F.round(
            (F.pow("p", F.lit(_ALPHA)) / F.col("_q")) / F.col("p"),
            _BOOST_DECIMALS,
        ).alias("boost"),
    ).orderBy("lang")


LANG_TEMPERATURE_SQL = rf"""
WITH per AS (
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(trim(text), '[ \t\r\n]+')))
                AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
tot AS (SELECT SUM(n_tokens) AS t FROM per),
p AS (
    SELECT lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / t AS p
    FROM per, tot
),
q AS (SELECT SUM(POWER(p, {_ALPHA})) AS qs FROM p)
SELECT lang, n_docs, n_tokens,
       ROUND(p, {_P_DECIMALS}) AS p_tokens,
       ROUND(POWER(p, {_ALPHA}) / qs, {_P_DECIMALS}) AS q_sample,
       ROUND((POWER(p, {_ALPHA}) / qs) / p, {_BOOST_DECIMALS}) AS boost
FROM p, q
ORDER BY lang
"""


EXT18_QUERIES = {
    "redact_pii_docs": (redact_pii_docs, REDACT_PII_SQL),
    "lang_temperature_weights": (lang_temperature_weights, LANG_TEMPERATURE_SQL),
}
