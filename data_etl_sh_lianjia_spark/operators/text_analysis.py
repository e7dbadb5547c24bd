"""Text-analysis operators over the documents corpus — SURVEY.md §2.9 L4/L6.

Everything is built from JVM-side expressions (split / filter / transform /
aggregate / regexp) — no Python in the row path — and every hash primitive is
``md5`` because its hex output is identical across Spark and DuckDB (the
engines' native ``hash()`` functions differ and can never oracle-match).

At 100 TB these are embarrassingly parallel scans: no shuffle except the
final aggregation, so they pipeline behind the parquet read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables

# Tiny per-language marker-token lists for the n-gram/stopword language-ID
# heuristic. Deliberately minimal: the operator's value is the *shape*
# (vectorized token-set scoring + argmax), not lexicographic completeness.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "with", "fast"),
    "es": ("el", "la", "de", "con", "rapido"),
    "de": ("der", "die", "und", "mit", "schnell"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, names=("documents",))["documents"]


@register(
    "text_stats",
    oracle="""
SELECT doc_id, lang,
       length(text) AS text_len,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) - length(replace(text, 'a', '')) AS n_a,
       abs(n_chars - length(text)) AS n_chars_drift,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / greatest(len(string_split(text, ' ')), 1), 6) AS avg_token_len
FROM documents
""",
    survey_ref="L4,L6",
    doc="per-document length/token/char stats + metadata-drift quality signal",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("text_len"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", "a", ""))).cast("bigint").alias("n_a"),
        F.abs(F.col("n_chars") - F.length("text")).alias("n_chars_drift"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def _marker_score_spark(markers: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{m}'" for m in markers)
    return f"CAST(size(filter(split(text, ' '), t -> array_contains(array({arr}), t))) AS BIGINT)"


def _marker_score_duck(markers: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), t -> list_contains([{arr}], t)))"


@register(
    "lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_marker_score_duck(_LANG_MARKERS['en'])} AS score_en,
         {_marker_score_duck(_LANG_MARKERS['es'])} AS score_es,
         {_marker_score_duck(_LANG_MARKERS['de'])} AS score_de
  FROM documents
)
SELECT doc_id, lang, score_en, score_es, score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
            WHEN score_es >= score_de THEN 'es'
            ELSE 'de' END AS predicted_lang
FROM scored
""",
    survey_ref="L4",
    doc="stopword-marker language-ID heuristic with deterministic argmax",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "lang",
        F.expr(_marker_score_spark(_LANG_MARKERS["en"])).alias("score_en"),
        F.expr(_marker_score_spark(_LANG_MARKERS["es"])).alias("score_es"),
        F.expr(_marker_score_spark(_LANG_MARKERS["de"])).alias("score_de"),
    )
    return scored.withColumn(
        "predicted_lang",
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_de")),
            "en",
        )
        .when(F.col("score_es") >= F.col("score_de"), "es")
        .otherwise("de"),
    )


@register(
    "token_count_bpe",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS bpe_ish_tokens,
       len(regexp_extract_all(text, '[a-z]{1,4}')) AS subword_pieces
FROM documents
""",
    survey_ref="L4",
    doc="whitespace + BPE-ish regex token counting",
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{1,4}', 0)"))
        .cast("bigint")
        .alias("subword_pieces"),
    )


@register(
    "quality_filter",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000
  AND length(text) >= 100
  AND abs(n_chars - length(text)) <= 200
  AND len(list_distinct(string_split(text, ' '))) >= 10
""",
    survey_ref="L6",
    doc="heuristic quality gate: token-count band, length floor, metadata drift, vocab richness",
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return docs.filter(
        F.size(toks).between(20, 1000)
        & (F.length("text") >= 100)
        & (F.abs(F.col("n_chars") - F.length("text")) <= 200)
        & (F.size(F.array_distinct(toks)) >= 10)
    ).select("doc_id", "lang", "source")


# Rolling-hash document fingerprint: 3-token shingles -> md5 -> lexicographic
# min (MinHash with one hash function). The Spark/DuckDB expressions are kept
# structurally parallel; both guard the <3-token case to an empty shingle set.
_SPARK_SHINGLES = """
CASE WHEN size(split(text, ' ')) >= 3 THEN
  transform(sequence(1, size(split(text, ' ')) - 2),
            i -> concat_ws(' ', element_at(split(text, ' '), i),
                                element_at(split(text, ' '), i + 1),
                                element_at(split(text, ' '), i + 2)))
ELSE array(text) END
"""

_DUCK_SHINGLES = """
CASE WHEN len(string_split(text, ' ')) >= 3 THEN
  list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                 i -> concat_ws(' ', string_split(text, ' ')[i],
                                     string_split(text, ' ')[i + 1],
                                     string_split(text, ' ')[i + 2]))
ELSE [text] END
"""


@register(
    "doc_fingerprint",
    oracle=f"""
SELECT doc_id,
       list_min(list_transform({_DUCK_SHINGLES}, s -> md5(s))) AS fingerprint,
       len(list_distinct({_DUCK_SHINGLES})) AS n_shingles
FROM documents
""",
    survey_ref="L4,L2",
    doc="rolling 3-gram shingle fingerprint (min-md5) per document",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.expr(f"array_min(transform({_SPARK_SHINGLES}, s -> md5(s)))").alias(
            "fingerprint"
        ),
        F.expr(f"CAST(size(array_distinct({_SPARK_SHINGLES})) AS BIGINT)").alias("n_shingles"),
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-01[0-9]{2}"


@register(
    "pii_redaction",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-01'
              || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '.' AS t
  FROM documents WHERE doc_id % 5 = 0
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones
FROM aug
""",
    survey_ref="L6,F2,F6",
    doc="PII redaction: email/phone regex scrub + match counts (training-data hygiene)",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data hygiene op: scrub emails/phones and count what was
    found. PII is injected deterministically from doc_id (both engines
    build the identical payload) so the scrub provably fires on every row.
    All whole-stage-codegen'd regex — the patterns stay in the RE2/Java
    common subset (no backrefs, no lookaround) so semantics match across
    engines. At 100 TB this is a map-only pass: no shuffle, prunes to two
    columns at the scan."""
    docs = _docs(spark, sf_dir)
    t = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit("."),
    )
    aug = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", t.alias("t")
    )
    return aug.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
    )
