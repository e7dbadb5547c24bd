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
    """Every derived stat reduces to LENGTH arithmetic over literal
    (non-regex) REPLACE — no split, no regexp: for a single-space
    separator, size(split(text,' ')) == #spaces + 1 exactly (consecutive
    and trailing separators both yield empty tokens in split AND count as
    spaces, so the identity has no edge cases; '' -> 1 either way), and
    the non-space character count is length - #spaces. Cuts the per-row
    cost from two regex passes + a split-allocated array to three string
    scans — the difference between parity and beating the baseline at the
    100x curve point, where this operator is pure per-row CPU."""
    docs = _docs(spark, sf_dir)
    n_spaces = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    )
    n_tokens = (n_spaces + F.lit(1)).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("text_len"),
        n_tokens.alias("n_tokens"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("a"), F.lit("")))
        ).cast("bigint").alias("n_a"),
        F.abs(F.col("n_chars") - F.length("text")).alias("n_chars_drift"),
        F.round(
            (F.length("text") - n_spaces).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
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


def shingles_of(words: str) -> str:
    """3-gram shingle expression over a PRE-SPLIT word-array column.

    Callers must hoist ``split(text, ' ')`` into a projected column first:
    Catalyst does not common-subexpression-eliminate inside lambda bodies,
    so inlining the split re-tokenizes the document once per element_at —
    O(words²) splits per row (measured: the shingle explode over sf0.1
    documents dropped 10 s -> ~1 s after hoisting)."""
    return f"""
CASE WHEN size({words}) >= 3 THEN
  transform(sequence(1, size({words}) - 2),
            i -> concat_ws(' ', element_at({words}, i),
                                element_at({words}, i + 1),
                                element_at({words}, i + 2)))
ELSE array(text) END
"""


# Inline single-expression form (kept for contexts that cannot hoist);
# hot paths use shingles_of() over a hoisted words column instead.
_SPARK_SHINGLES = shingles_of("split(text, ' ')")

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
    return (
        docs.withColumn("words", F.split("text", " "))
        .withColumn("shg", F.expr(shingles_of("words")))
        .select(
            "doc_id",
            F.expr("array_min(transform(shg, s -> md5(s)))").alias("fingerprint"),
            F.expr("CAST(size(array_distinct(shg)) AS BIGINT)").alias("n_shingles"),
        )
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


# ---------------------------------------------------------------------------
# Gopher-style repetition metrics + unigram surprisal (SURVEY.md §2.9 L4/L6)
# ---------------------------------------------------------------------------

# Thresholds chosen against the corpus distribution (uniq_frac median 0.46,
# min 0.28; top_bigram_frac median 0.033, max 0.167): the flag fires on a
# meaningful minority, not none/all rows.
_REP_UNIQ_MIN = 0.35
_REP_BIGRAM_MAX = 0.08


@register(
    "repetition_stats",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), b AS (
  SELECT doc_id, words,
         list_transform(range(1, len(words)),
                        i -> words[i] || ' ' || words[i + 1]) AS bigrams
  FROM w
), s AS (
  SELECT doc_id,
         len(words) AS n_words,
         round(CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 6) AS uniq_frac,
         round(CAST(list_max(list_transform(list_distinct(words),
                  d -> len(list_filter(words, x -> x = d)))) AS DOUBLE)
               / len(words), 6) AS top_word_frac,
         CASE WHEN len(bigrams) = 0 THEN 0.0
              ELSE round(CAST(list_max(list_transform(list_distinct(bigrams),
                       d -> len(list_filter(bigrams, x -> x = d)))) AS DOUBLE)
                   / len(bigrams), 6) END AS top_bigram_frac
  FROM b
)
SELECT doc_id, n_words, uniq_frac, top_word_frac, top_bigram_frac,
       (uniq_frac < {_REP_UNIQ_MIN} OR top_bigram_frac >= {_REP_BIGRAM_MAX})
         AS is_repetitive
FROM s
""",
    survey_ref="L4,L6",
    doc="Gopher-style repetition signals: type-token ratio, top word/bigram fraction",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText filter
    family): type-token ratio, most-common-word fraction, most-common-
    bigram fraction, and the combined repetitive-document flag.

    Everything is a row-local array expression (split -> zip_with ->
    sort + run-length fold), so at 100 TB this is a map-only pass with no
    shuffle and no Python: the per-row cost is O(words log words) — the
    most-common-element count folds once over the sorted array instead of
    filtering per distinct element (the O(distinct x words) lambda form
    measured ~2x slower at the 10x replica). Divisions are exact-int over
    exact-int rounded to 6, so the oracle hash-matches bit-for-bit."""
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    # zip_with over two shifted slices: no sequence() guard needed — a
    # 1-word doc slices to two empty arrays and yields zero bigrams.
    bigrams = F.expr(
        "zip_with(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 1, 0)),"
        "         slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    # max run length over the sorted array == count of the most common
    # element; single left fold, no per-distinct rescan
    top_count = lambda arr: (  # noqa: E731
        f"aggregate(array_sort({arr}),"
        " named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1),"
        "   'best', GREATEST(acc.best,"
        "     IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1))),"
        " acc -> acc.best)"
    )
    base = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.round(
            F.size(F.array_distinct(words)).cast("double") / F.size(words), 6
        ).alias("uniq_frac"),
        F.round(
            F.expr(top_count("split(text, ' ')")).cast("double") / F.size(words), 6
        ).alias("top_word_frac"),
        bigrams.alias("bigrams"),
    )
    base = base.withColumn(
        "top_bigram_frac",
        F.when(F.size("bigrams") == 0, F.lit(0.0)).otherwise(
            F.round(
                F.expr(top_count("bigrams")).cast("double") / F.size("bigrams"), 6
            )
        ),
    ).drop("bigrams")
    return base.withColumn(
        "is_repetitive",
        (F.col("uniq_frac") < _REP_UNIQ_MIN)
        | (F.col("top_bigram_frac") >= _REP_BIGRAM_MAX),
    )


@register(
    "unigram_surprisal",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, COUNT(*) AS cnt FROM words GROUP BY w
), tot AS (
  SELECT SUM(cnt) AS total FROM freq
), scored AS (
  SELECT doc_id,
         CAST(round(-log10(cnt / CAST(total AS DOUBLE)), 9) AS DECIMAL(20,9)) AS surp
  FROM words JOIN freq USING (w) CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_tokens,
       round(CAST(SUM(surp) AS DOUBLE) / COUNT(*), 4) AS avg_surprisal,
       round(CAST(MAX(surp) AS DOUBLE), 4) AS max_surprisal
FROM scored
GROUP BY doc_id
""",
    survey_ref="L4,L6",
    doc="corpus-unigram surprisal score per document (perplexity-proxy quality)",
)
def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: mean per-token surprisal
    -log10 p(w) under the corpus's own unigram distribution — the cheap
    stand-in for model-based perplexity filtering in LLM data pipelines.

    Scale shape: the token explode is row-local; the frequency table
    shuffles on the word key but is VOCABULARY-sized (bounded, unlike the
    corpus) and broadcasts back to the token stream, so the only
    corpus-sized shuffle is the final per-document aggregation.
    Determinism: each surprisal is rounded to 9 decimals and summed as
    DECIMAL (exact, order-independent) before the final 4-decimal round —
    the same dsum contract as every float aggregate in the registry."""
    docs = _docs(spark, sf_dir)
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    surp = F.expr(
        "CAST(round(-log10(cnt / CAST(total AS DOUBLE)), 9) AS DECIMAL(20,9))"
    )
    scored = (
        words.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(total))
        .select("doc_id", surp.alias("surp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("surp").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_surprisal"
        ),
        F.round(F.max("surp").cast("double"), 4).alias("max_surprisal"),
    )


# ---------------------------------------------------------------------------
# L4/L3 — BM25 ranked retrieval (keyword search over the corpus)
# ---------------------------------------------------------------------------

# Fixed query terms spanning the corpus df spectrum (the synthetic docs use
# a database-flavored vocabulary); k1/b are the standard Robertson defaults.
_BM25_TERMS = ("join", "filter", "data")
_BM25_K1 = 1.2
_BM25_B = 0.75

# Per-engine SQL fragments for the shared BM25/hybrid query text. ONE place:
# bm25_topk and hybrid_search_rrf's lexical leg are built from the same CTE
# block, so the scoring contract (k1/b, term list, quantization scales)
# cannot drift between them.
_DIALECTS = {
    "spark": {
        "docs": "lj_documents",
        "emb": "lj_embeddings",
        "split": "split(text, ' ')",
        "length": "size",
        "contains": "size(filter(words, x -> x = '{term}'))",
        "cond": "COUNT(IF(tf{i} > 0, 1, NULL))",
        "cos": (
            "aggregate(zip_with(e.embedding, q.qv, (x, y) ->"
            " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (p, s) -> p + s)"
            " / (sqrt(aggregate(e.embedding, 0D,"
            "          (p, x) -> p + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
            " * sqrt(aggregate(q.qv, 0D,"
            "          (p, x) -> p + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        ),
    },
    "duck": {
        "docs": "documents",
        "emb": "embeddings",
        "split": "string_split(text, ' ')",
        "length": "len",
        "contains": "len(list_filter(words, x -> x = '{term}'))",
        "cond": "COUNT(CASE WHEN tf{i} > 0 THEN 1 END)",
        "cos": (
            "list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),"
            " CAST(q.qv AS DOUBLE[]))"
        ),
    },
}


def _bm25_core(dialect: str) -> tuple[str, str]:
    """The shared BM25 scaffold: returns (CTE block ``d/t/s/i``, score
    expression over ``t CROSS JOIN i``). idf is quantized to 9 decimals
    BEFORE composing the score (ln() may differ by 1 ulp across libm
    implementations); callers floor-quantize the composed score — the
    repo-wide cross-engine rounding contract."""
    d = _DIALECTS[dialect]
    k1, b = _BM25_K1, _BM25_B
    tf_cols = ", ".join(
        d["contains"].format(term=t) + f" AS tf{i}"
        for i, t in enumerate(_BM25_TERMS, 1)
    )
    df_cols = ", ".join(
        d["cond"].format(i=i) + f" AS df{i}"
        for i in range(1, len(_BM25_TERMS) + 1)
    )
    idf_cols = ", ".join(
        f"floor(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1) * 1000000000 + 0.5)"
        f" / 1000000000 AS idf{i}"
        for i in range(1, len(_BM25_TERMS) + 1)
    )
    score = " + ".join(
        f"idf{i} * tf{i} * {k1 + 1} / (tf{i} + {k1} * ({1 - b} + {b} * dl / avgdl))"
        for i in range(1, len(_BM25_TERMS) + 1)
    )
    ctes = f"""d AS (
  SELECT doc_id, {d["split"]} AS words, {d["length"]}({d["split"]}) AS dl
  FROM {d["docs"]}
), t AS (
  SELECT doc_id, dl, {tf_cols} FROM d
), s AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sumdl, {df_cols} FROM t
), i AS (
  SELECT n, CAST(sumdl AS DOUBLE) / n AS avgdl, {idf_cols} FROM s
)"""
    return ctes, score


def _bm25_sql(dialect: str) -> str:
    ctes, score = _bm25_core(dialect)
    return f"""
WITH {ctes}
SELECT t.doc_id,
       CAST(t.tf1 AS BIGINT) AS tf_join,
       CAST(t.tf2 AS BIGINT) AS tf_filter,
       CAST(t.tf3 AS BIGINT) AS tf_data,
       floor(({score}) * 1000000 + 0.5) / 1000000 AS score
FROM t CROSS JOIN i
ORDER BY score DESC, t.doc_id
LIMIT 10
"""


@register(
    "bm25_topk",
    oracle=_bm25_sql("duck"),
    survey_ref="L4,L3,A3,O3",
    doc="BM25 ranked retrieval: fixed 3-term query, corpus stats, top-10 docs",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search over the corpus: full Okapi BM25 with corpus-derived
    idf and length normalization — the lexical half of a hybrid
    (BM25 + embedding) retrieval stack; `chunk_embed_topk` is the dense
    half.

    Scale shape: per-term tf is a row-local array filter inside the scan;
    the corpus statistics (N, avg doc length, per-term document
    frequencies) reduce to ONE row (conditional counts in a single
    partial-agg'd pass — no per-term scan) that broadcasts back via cross
    join, so the second pass scores inside the scan and the only sort is
    the global top-10 (TakeOrderedAndProject). In production the stats row
    is an incremental index artifact (df counts merge by addition across
    ingest batches), so queries pay one scan, not two.
    Determinism: idf quantized to 9 decimals before composing (ln differs
    by ulps across libms), score floor-quantized to 6, doc_id tiebreak.
    """
    from data_etl_sh_lianjia_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(_bm25_sql("spark"))


# ---------------------------------------------------------------------------
# L3+L4 — hybrid retrieval: BM25 ∪ dense cosine, reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60  # standard RRF damping (Cormack et al. 2009, public)
_RRF_DEPTH = 20  # per-ranker candidate depth feeding the fusion
_RRF_QUERY_VEC = 0  # query = embedding of doc 0 (ids align 1:1 with docs)


def _hybrid_sql(dialect: str) -> str:
    """Hybrid pipeline query text, built ON the shared BM25 scaffold
    (`_bm25_core`) plus a dense cosine leg and RRF fusion.

    Lexical leg: the BM25 scorer (identical CTE block to bm25_topk).
    Dense leg: cosine of every embedding against the fixed query vector.
    Fusion: RRF = sum over legs of 1/(k + rank) — rank-based, so the two
    legs' incomparable score scales never touch; every score is
    floor-quantized before ranking and ids break ties, making both ranks
    and the fused ordering deterministic across engines.
    """
    d = _DIALECTS[dialect]
    ctes, score = _bm25_core(dialect)
    qvec = f"SELECT embedding AS qv FROM {d['emb']} WHERE vec_id = {_RRF_QUERY_VEC}"
    return f"""
WITH {ctes}, lex_scored AS (
  SELECT t.doc_id,
         floor(({score}) * 1000000 + 0.5) / 1000000 AS lex_score
  FROM t CROSS JOIN i
), lex AS (
  SELECT doc_id, lex_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY lex_score DESC, doc_id) AS lex_rank
    FROM lex_scored WHERE lex_score > 0) r
  WHERE lex_rank <= {_RRF_DEPTH}
), q AS ({qvec}), dense_scored AS (
  SELECT e.vec_id AS doc_id,
         floor(({d["cos"]}) * 1000000 + 0.5) / 1000000 AS sim
  FROM {d["emb"]} e CROSS JOIN q
  WHERE e.vec_id <> {_RRF_QUERY_VEC}
), dense AS (
  SELECT doc_id, dense_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY sim DESC, doc_id) AS dense_rank
    FROM dense_scored) r
  WHERE dense_rank <= {_RRF_DEPTH}
), fused AS (
  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
         lex.lex_rank, dense.dense_rank,
         floor((COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + lex.lex_rank), 0)
              + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + dense.dense_rank), 0))
               * 1000000000 + 0.5) / 1000000000 AS rrf
  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
)
SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
       CAST(dense_rank AS BIGINT) AS dense_rank, CAST(rrf AS DOUBLE) AS rrf
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


@register(
    "hybrid_search_rrf",
    oracle=_hybrid_sql("duck"),
    survey_ref="L3,L4,J3,W1",
    doc="hybrid retrieval: BM25 + dense-cosine legs fused by reciprocal rank",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed retrieval stack of a production RAG pipeline in one
    declared query: a lexical BM25 ranking and a dense cosine ranking are
    each cut to a fixed candidate depth, then fused by reciprocal-rank
    (1/(k+rank)) — rank fusion sidesteps the incomparable score scales.

    Scale shape: each leg is the already-scale-vetted shape (BM25's
    one-row stats broadcast; dense leg broadcast-query cosine confined to
    per-row vector math), both legs end in a bounded top-DEPTH window, and
    the fusion joins two DEPTH-row relations — trivially broadcastable at
    any corpus size. In production each leg is served by its index (keydict
    stats / IVF buckets); the fusion is unchanged.
    """
    from data_etl_sh_lianjia_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(_hybrid_sql("spark"))


# ---------------------------------------------------------------------------
# L4 — bigram LM count-of-counts (Good-Turing smoothing table)
# ---------------------------------------------------------------------------


@register(
    "bigram_good_turing",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bi AS (
  SELECT ws[i] || ' ' || ws[i + 1] AS bg
  FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
),
counts AS (SELECT bg, COUNT(*) AS freq FROM bi GROUP BY bg),
coc AS (
  SELECT CAST(freq AS BIGINT) AS freq,
         CAST(COUNT(*) AS BIGINT) AS n_types
  FROM counts GROUP BY freq
)
SELECT freq, n_types,
       CASE WHEN lead(freq) OVER w = freq + 1
            THEN round((freq + 1) * CAST(lead(n_types) OVER w AS DOUBLE)
                       / n_types, 6)
       END AS gt_adjusted
FROM coc WINDOW w AS (ORDER BY freq)
""",
    survey_ref="L4,A3,W2",
    doc="bigram count-of-counts + Good-Turing adjusted counts (LM smoothing table)",
)
def bigram_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Good-Turing smoothing table a count-based LM build needs from
    its corpus: bigram frequencies -> frequency-of-frequencies N_r -> the
    adjusted count r* = (r+1) * N_{r+1} / N_r (NULL where N_{r+1} is
    unobserved, the textbook gap case).

    Scale shape: the bigram explode is row-local (the same zip_with
    slice pair as repetition_stats); the first groupBy shuffles on the
    bigram key (vocabulary^2-bounded, not corpus-bounded); the
    count-of-counts table is then a few dozen rows, so the global-order
    window costs nothing. At 100 TB this is exactly the two-stage
    map-reduce every n-gram LM pipeline (e.g. the classic MapReduce LM
    builds) runs — counts merge across shards by addition, and
    count-of-counts re-derive from merged counts."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    bigrams = F.expr(
        "zip_with(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 1, 0)),"
        "         slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)),"
        "         (a, b) -> concat(a, ' ', b))"
    )
    counts = (
        docs.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    coc = counts.groupBy("freq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types")
    )
    w = Window.orderBy("freq")
    gt = F.when(
        F.lead("freq").over(w) == F.col("freq") + 1,
        F.round(
            (F.col("freq") + 1)
            * F.lead("n_types").over(w).cast("double")
            / F.col("n_types"),
            6,
        ),
    )
    return coc.select(
        F.col("freq").cast("bigint").alias("freq"),
        "n_types",
        gt.alias("gt_adjusted"),
    )


@register(
    "bigram_interpolated_logprob",
    oracle="""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents
), pairs AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id,
           lag(w) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
           w AS w2
    FROM words
  ) WHERE w1 IS NOT NULL
), uni AS (
  SELECT w, COUNT(*) AS cnt FROM words GROUP BY w
), tot AS (
  SELECT SUM(cnt) AS n FROM uni
), big AS (
  SELECT w1, w2, COUNT(*) AS cnt FROM pairs GROUP BY w1, w2
), scored AS (
  SELECT p.doc_id,
         CAST(round(-log10(
             0.75 * (b.cnt / CAST(u1.cnt AS DOUBLE))
           + 0.25 * (u2.cnt / CAST(t.n AS DOUBLE))
         ), 9) AS DECIMAL(20,9)) AS surp
  FROM pairs p
  JOIN big b ON p.w1 = b.w1 AND p.w2 = b.w2
  JOIN uni u1 ON p.w1 = u1.w
  JOIN uni u2 ON p.w2 = u2.w
  CROSS JOIN tot t
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       round(CAST(SUM(surp) AS DOUBLE) / COUNT(*), 4) AS avg_logprob
FROM scored
GROUP BY doc_id
""",
    survey_ref="L4,L6",
    doc="per-doc cross-entropy under an interpolated corpus bigram model "
        "(sequence-sensitive perplexity-proxy quality score)",
)
def bigram_interpolated_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean -log10 of an interpolated bigram model
    (0.75·p(w2|w1) + 0.25·p(w2)) trained on the corpus itself — the
    sequence-sensitive step up from `unigram_surprisal`: repeated or
    shuffled word salad scores poorly even when its unigrams are common,
    which is exactly what model-based perplexity filters catch in LLM
    data pipelines (the unigram leg is the backoff for unseen history).

    Scale shape: the bigram stream comes from a window lag over
    (doc_id, position) — ONE shuffle on doc_id, no self-join; the bigram
    count table shuffles on the bigram key (bounded by observed bigram
    types, not corpus size); the unigram table is vocabulary-sized and
    broadcasts. Determinism: per-token surprisal rounds to 9 decimals and
    sums as DECIMAL (exact, order-independent) before the final 4-decimal
    round — the registry's standard float-aggregate contract."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        words.select(
            "doc_id",
            F.lag("w").over(w_doc).alias("w1"),
            F.col("w").alias("w2"),
        )
        .filter(F.col("w1").isNotNull())
    )
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = uni.agg(F.sum("cnt").alias("n"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt_b"))
    surp = F.expr(
        "CAST(round(-log10("
        "  0.75 * (cnt_b / CAST(cnt_1 AS DOUBLE))"
        " + 0.25 * (cnt_2 / CAST(n AS DOUBLE))"
        "), 9) AS DECIMAL(20,9))"
    )
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"),
                                   F.col("cnt").alias("cnt_1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"),
                                   F.col("cnt").alias("cnt_2"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select("doc_id", surp.alias("surp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("surp").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_logprob"
        ),
    )


@register(
    "gopher_quality_flags",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), m AS (
  SELECT doc_id,
         len(words) AS n_words,
         list_sum(list_transform(words, x -> length(x))) AS sum_len,
         len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
           AS n_alpha,
         (CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(words, 'and') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(words, 'of') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(words, 'to') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(words, 'in') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(words, 'a') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(words, 'is') THEN 1 ELSE 0 END
        + CASE WHEN list_contains(words, 'that') THEN 1 ELSE 0 END)
           AS stop_hits
  FROM w
)
SELECT doc_id, n_words,
       floor((CAST(sum_len AS DOUBLE) / n_words) * 10000 + 0.5) / 10000
         AS mean_word_len,
       floor((CAST(n_alpha AS DOUBLE) / n_words) * 10000 + 0.5) / 10000
         AS alpha_word_frac,
       stop_hits,
       (n_words >= 20
        AND (CAST(sum_len AS DOUBLE) / n_words) BETWEEN 3 AND 10
        AND (CAST(n_alpha AS DOUBLE) / n_words) > 0.8
        AND stop_hits >= 2) AS gopher_pass
FROM m
""",
    survey_ref="L6,L4",
    doc="Gopher-style document quality rules: word-count floor, mean word "
        "length band, alphabetic-word fraction, stopword presence",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher corpus-filtering heuristics (Rae et al. 2021,
    'Scaling Language Models: ... Gopher', Appendix A) as one
    whole-stage-codegen pass: word-count floor, mean word length in
    [3, 10], fraction of words containing an alphabetic character > 0.8,
    and at least 2 distinct common-stopword hits (the 'real prose'
    signal). Every rule is a JVM-side array expression — no UDF, no
    shuffle beyond the scan; at 100 TB this is the map-only pre-filter
    in front of every expensive pipeline stage. Ratios quantize via the
    cross-engine floor(x*1e4+0.5) contract; the raw (unquantized) ratios
    drive the boolean so the flag itself is exact."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sum_len = F.expr(
        "aggregate(transform(split(text, ' '), x -> length(x)),"
        " 0, (a, x) -> a + x)"
    )
    n_alpha = F.expr(
        "size(filter(split(text, ' '), x -> x rlike '[A-Za-z]'))"
    )
    stop_hits = sum(
        F.when(F.array_contains(toks, t), 1).otherwise(0)
        for t in ("the", "and", "of", "to", "in", "a", "is", "that")
    )
    mean_wl = sum_len.cast("double") / n
    alpha_frac = n_alpha.cast("double") / n
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        q4(mean_wl).alias("mean_word_len"),
        q4(alpha_frac).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        (
            (n >= 20)
            & mean_wl.between(3, 10)
            & (alpha_frac > 0.8)
            & (stop_hits >= 2)
        ).alias("gopher_pass"),
    )
