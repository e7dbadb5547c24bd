"""LLM training-data pipeline operators — SURVEY.md §2.9 extensions.

None of these exist in the reference (it stops at extraction); they are the
**[derived]** corpus-preparation stages between a raw crawl like the
reference's output and a training run, each expressed as a declared,
oracle-hashed query over the driver's ``documents`` corpus:

- *Chunking* splits documents into fixed-size overlapping windows
  (`sequence` + `explode` + `substring` — a Generate, row-local, no
  shuffle; at 100 TB this is embarrassingly parallel per input split).
- *Sequence packing* assigns documents to fixed token-budget bins
  (context-length packing). The streaming formulation used here —
  bin = floor(preceding-token-cumsum / budget) within a source — is one
  window pass; bins can overflow by at most one document, the standard
  trade against the O(n log n) global first-fit-decreasing packing that
  cannot stream. Partitioned by ``source`` so the window parallelizes.
- *Dataset mixture* reweights sources with per-source deterministic
  sampling rates (md5-threshold, engine/partitioning-independent — same
  recipe as `deterministic_sample`), the mixing step of corpus assembly.
- *Contamination screening* flags training documents sharing 5-gram
  shingles with a held-out benchmark set (exact-overlap variant of the
  standard n-gram decontamination pass). Shingle-join shape: explode to
  (shingle, doc) pairs, distinct, equi-join on shingle — at scale the
  join shuffles on the shingle hash, so cost follows shared-shingle
  density, never |train| × |benchmark|.
- *URL parsing* (`parse_url`) covers the crawl-metadata hygiene family
  (host/path/query extraction for filtering and per-domain stats); the
  oracle mirrors it with regexes since DuckDB has no URL parser.
- *OHLC downsampling* (min_by/max_by per time bucket) is the time-series
  summarization twin of `resample_gapfill` (open/high/low/close bars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.operators.lakehouse import md5_bucket
from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables

_CHUNK = 200  # chars per chunk
_STRIDE = 150  # chunk start stride (=> 50-char overlap)
_PACK_BUDGET = 512  # tokens per packed sequence bin


@register(
    "doc_chunking",
    oracle=f"""
SELECT doc_id,
       CAST(pos AS BIGINT) AS chunk_start,
       substr(text, pos, {_CHUNK}) AS chunk,
       CAST(length(substr(text, pos, {_CHUNK})) AS BIGINT) AS chunk_len
FROM (
  SELECT doc_id, text, unnest(generate_series(1, len(text), {_STRIDE})) AS pos
  FROM documents WHERE doc_id % 5 = 0
)
""",
    survey_ref="L4,P1,F13",
    doc="fixed-size overlapping document chunks (substring windows) for context packing",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """200-char chunks every 150 chars (50-char overlap). ``sequence`` of
    chunk starts + ``explode`` + ``substring`` stays entirely inside
    whole-stage codegen — no UDF, no shuffle; output size ~len/stride per
    doc regardless of corpus size."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text"), F.lit(_STRIDE))
            ).alias("chunk_start"),
            "text",
        )
        .select(
            "doc_id",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.expr(f"substr(text, chunk_start, {_CHUNK})").alias("chunk"),
            F.expr(f"CAST(length(substr(text, chunk_start, {_CHUNK})) AS BIGINT)").alias(
                "chunk_len"
            ),
        )
    )


@register(
    "pack_sequences",
    oracle=f"""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tok,
         CAST((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok)
              // {_PACK_BUDGET} AS BIGINT) AS bin_id
  FROM toks
)
SELECT source, bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, bin_id
""",
    survey_ref="L4,W3,A3",
    doc="context-length sequence packing: token-budget bins via one window cumsum per source",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing: a document's bin is
    ``floor(tokens-before-it / budget)`` within its source (deterministic
    doc_id order). One window pass, partitioned by source — each bin holds
    >= budget tokens only by the final straddling document, the standard
    streaming-packing overflow bound. Global FFD packing would need a
    corpus-wide sort + sequential state; this shape scales linearly and
    parallelizes per source shard."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    toks = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.withColumn(
        "bin_id",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(_PACK_BUDGET))
        .cast("bigint"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "dataset_mixture",
    oracle="""
WITH rated AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bkt,
         CASE CAST(substr(source, 4) AS INT) % 4
           WHEN 0 THEN 'ff' WHEN 1 THEN '80' WHEN 2 THEN '40' ELSE '20'
         END AS thr
  FROM documents
)
SELECT source,
       COUNT(*) FILTER (WHERE bkt < thr) AS kept_docs,
       CAST(COALESCE(SUM(n_tok) FILTER (WHERE bkt < thr), 0) AS BIGINT)
           AS kept_tokens,
       COUNT(*) AS total_docs
FROM rated
GROUP BY source
""",
    survey_ref="L4,O5,A3,A6",
    doc="dataset mixing: per-source deterministic sampling rates (corpus reweighting)",
)
def dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: each source keeps a deterministic md5-threshold
    fraction (src%4: 100%/50%/25%/12.5%) — the weighted-mixture step of
    training-corpus assembly, auditable because the same rows are kept on
    any engine or cluster layout. Pure scan filter + one agg shuffle."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    thr = (
        F.when(F.expr("CAST(substr(source, 4) AS INT) % 4") == 0, "ff")
        .when(F.expr("CAST(substr(source, 4) AS INT) % 4") == 1, "80")
        .when(F.expr("CAST(substr(source, 4) AS INT) % 4") == 2, "40")
        .otherwise("20")
    )
    kept = md5_bucket("doc_id") < thr
    n_tok = F.size(F.split("text", " "))
    return docs.groupBy("source").agg(
        F.count(F.when(kept, 1)).alias("kept_docs"),
        F.coalesce(F.sum(F.when(kept, n_tok)), F.lit(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.count(F.lit(1)).alias("total_docs"),
    )


# 5-token shingles, structurally identical in both engines (the same
# parallel-expression discipline as text_analysis._SPARK_SHINGLES).
_SPARK_5GRAMS = """
CASE WHEN size(split(text, ' ')) >= 5 THEN
  transform(sequence(1, size(split(text, ' ')) - 4),
            i -> concat_ws(' ', element_at(split(text, ' '), i),
                                element_at(split(text, ' '), i + 1),
                                element_at(split(text, ' '), i + 2),
                                element_at(split(text, ' '), i + 3),
                                element_at(split(text, ' '), i + 4)))
ELSE array(text) END
"""

_DUCK_5GRAMS = """
CASE WHEN len(string_split(text, ' ')) >= 5 THEN
  list_transform(generate_series(1, len(string_split(text, ' ')) - 4),
                 i -> concat_ws(' ', string_split(text, ' ')[i],
                                     string_split(text, ' ')[i + 1],
                                     string_split(text, ' ')[i + 2],
                                     string_split(text, ' ')[i + 3],
                                     string_split(text, ' ')[i + 4]))
ELSE [text] END
"""


@register(
    "contamination_ngram",
    oracle=f"""
WITH bench AS (
  SELECT DISTINCT unnest({_DUCK_5GRAMS}) AS shingle
  FROM documents WHERE doc_id % 97 = 0
), train AS (
  SELECT doc_id, unnest(list_distinct({_DUCK_5GRAMS})) AS shingle
  FROM documents WHERE doc_id % 97 <> 0
)
SELECT t.doc_id, COUNT(*) AS n_shared,
       COUNT(*) >= 2 AS contaminated
FROM train t JOIN bench b ON t.shingle = b.shingle
GROUP BY t.doc_id
""",
    survey_ref="L2,L4,J3,A3",
    doc="benchmark decontamination: training docs sharing 5-gram shingles with a held-out set",
)
def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram decontamination: distinct 5-gram shingles of the
    benchmark split (doc_id % 97 == 0 stands in for an eval set) broadcast
    against exploded training shingles; per-doc shared-shingle counts flag
    contamination. The join key is the shingle string — at 100 TB hash the
    shingle first (sha2 prefix) so the broadcast set is fixed-width and the
    explode output stays narrow."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(F.expr(_SPARK_5GRAMS)).alias("shingle"))
        .distinct()
    )
    train = docs.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({_SPARK_5GRAMS})")).alias("shingle"),
    )
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select("doc_id", "n_shared", (F.col("n_shared") >= 2).alias("contaminated"))
    )


@register(
    "url_parse_suite",
    oracle="""
WITH u AS (
  SELECT o_orderkey,
         'https://shop-' || CAST(o_orderkey % 7 AS VARCHAR) ||
         '.example.com/' || o_orderstatus || '/item/' ||
         CAST(o_orderkey AS VARCHAR) || '?page=' ||
         CAST(o_orderkey % 13 AS VARCHAR) || '&sort=price' AS url
  FROM orders WHERE o_orderkey % 501 = 0
)
SELECT o_orderkey, url,
       regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
       regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page
FROM u
""",
    survey_ref="F2,F4,L4",
    doc="URL host/path/query parsing (parse_url) for crawl-metadata hygiene",
)
def url_parse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_url`` host/path/query extraction — the per-domain filtering
    primitive of crawl curation (the reference builds URLs by concat,
    lianjia.py:34,42; this is the inverse). URLs are synthesized from
    orders so the check is closed-form; the DuckDB oracle parses the same
    strings with regexes (it has no URL parser)."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    url = F.concat(
        F.lit("https://shop-"),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit(".example.com/"),
        F.col("o_orderstatus"),
        F.lit("/item/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?page="),
        (F.col("o_orderkey") % 13).cast("string"),
        F.lit("&sort=price"),
    )
    return (
        orders.filter(F.col("o_orderkey") % 501 == 0)
        .select("o_orderkey", url.alias("url"))
        .select(
            "o_orderkey",
            "url",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
        )
    )


@register(
    "ohlc_downsample",
    oracle="""
SELECT user_id,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
       COUNT(*) AS n,
       arg_min(value, epoch_us(ts)) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, epoch_us(ts)) AS close
FROM events
WHERE user_id % 40 = 0
GROUP BY user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT)
""",
    survey_ref="A3,A8,W3",
    doc="OHLC bars: min_by/max_by open/close per hourly bucket (time-series downsampling)",
)
def ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open/high/low/close downsampling via ``min_by``/``max_by`` on the
    event-time key — one hash aggregate, no window, no self-join (the
    classic alternative — row_number twice — costs two sorts). Event
    micro-timestamps are unique per user in this corpus, so the arg
    extremes are deterministic; values are untouched doubles (picked, not
    summed), hence exactly hashable cross-engine."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    e = ev.filter(F.col("user_id") % 40 == 0).select(
        "user_id",
        F.expr("(ts_ns div 1000) div 3600000000").alias("hour_bucket"),
        F.expr("ts_ns div 1000").alias("ts_us"),
        "value",
    )
    return e.groupBy("user_id", "hour_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by("value", "ts_us").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts_us").alias("close"),
    )


# ---------------------------------------------------------------------------
# Boilerplate n-gram removal (C4-style corpus-frequent span filtering)
# ---------------------------------------------------------------------------

_BOILER_MIN_DOCS = 5  # shingle present in >= this many docs => boilerplate


@register(
    "boilerplate_ngram_flags",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                     i -> concat_ws(' ', string_split(text, ' ')[i],
                                         string_split(text, ' ')[i + 1],
                                         string_split(text, ' ')[i + 2]))
    ELSE [text] END)) AS sh
  FROM documents
), freq AS (
  SELECT sh, COUNT(*) AS n_docs FROM sh GROUP BY sh
)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN n_docs >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_boiler,
       round(CAST(SUM(CASE WHEN n_docs >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS boiler_ratio
FROM sh JOIN freq USING (sh)
GROUP BY doc_id
""",
    survey_ref="L4,L6,A3,J1",
    doc=f"C4-style boilerplate: 3-gram shingles in >= {_BOILER_MIN_DOCS} docs flagged, per-doc boiler ratio",
)
def boilerplate_ngram_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent-span detection, the dedup-adjacent cleaning pass that
    strips nav bars / license footers from crawl corpora: distinct 3-gram
    shingles per doc, corpus frequency by distinct-doc count, spans present
    in ≥ {_BOILER_MIN_DOCS} docs marked boilerplate, and each doc scored by
    its boilerplate fraction. Scale shape: both the frequency aggregate and
    the back-join shuffle on the shingle value (hash-partitionable,
    partial-aggregated) — never on the corpus cross product; the per-doc
    rollup reuses the doc_id partitioning of the explode side."""
    from data_etl_sh_lianjia_spark.operators.text_analysis import shingles_of

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    sh = docs.withColumn("words", F.split("text", " ")).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(shingles_of("words")))).alias("sh"),
    )
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = F.when(F.col("n_docs") >= _BOILER_MIN_DOCS, 1).otherwise(0)
    return (
        sh.join(freq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(boiler).cast("bigint").alias("n_boiler"),
            F.round(
                F.sum(boiler).cast("double") / F.count(F.lit(1)), 6
            ).alias("boiler_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Group-preserving train/val/test split (leakage-safe corpus partitioning)
# ---------------------------------------------------------------------------


@register(
    "dataset_split_groups",
    oracle="""
WITH tagged AS (
  SELECT source, n_chars,
         CASE WHEN substr(md5(source), 1, 2) < 'e6' THEN 'train'
              WHEN substr(md5(source), 1, 2) < 'f3' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM tagged
GROUP BY split
""",
    survey_ref="O5,A3,A4",
    doc="group-preserving train/val/test split: md5(source) hex band routes whole groups",
)
def dataset_split_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe corpus split: the split key is the GROUP (source/domain),
    not the row, so near-duplicate documents from one crawl source can never
    straddle train and eval. Bands on the md5 hex prefix ('00'-'e5' train
    ≈ 90%, 'e6'-'f2' val ≈ 5%, rest test) are engine- and
    partitioning-independent — the same recipe as deterministic_sample,
    lifted from Bernoulli-per-row to per-group routing. One scan + one
    partial-aggregated shuffle on the split label."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    prefix = F.substring(F.md5("source"), 1, 2)
    split = (
        F.when(prefix < "e6", "train").when(prefix < "f3", "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# ---------------------------------------------------------------------------
# chunk -> embed -> retrieve: the composed RAG-indexing pipeline
# ---------------------------------------------------------------------------

_CE_CHUNK = 120  # chars per chunk (non-overlapping)
_CE_HEX = "0123456789abcdef"


def chunk_array_expr(text_col: str = "text") -> str:
    """Array of (chunk_idx, chunk) structs for non-overlapping fixed-size
    chunks. Empty-text guard: Spark's sequence(0, -1) is DESCENDING
    ([0, -1]) rather than empty, which would emit two phantom chunks per
    zero-length doc while DuckDB's range(0, 0) emits none — clamp the end
    to >= 0 and keep only offsets that start inside the text, so a
    zero-length (or NULL) doc yields no chunks in both engines."""
    return (
        f"transform(filter(sequence(0, greatest(CAST("
        f"ceil(length({text_col}) / {_CE_CHUNK}.0) AS INT) - 1, 0)),"
        f" k -> k * {_CE_CHUNK} < length({text_col})),"
        f" k -> named_struct('chunk_idx', CAST(k AS BIGINT),"
        f" 'chunk', substring({text_col}, k * {_CE_CHUNK} + 1, {_CE_CHUNK})))"
    )


def _hexvec_spark(col: str) -> str:
    """8-dim embedding from a 32-hex-digit column: one double per hex byte
    pair, via per-digit table lookup (instr) so the identical arithmetic
    runs in DuckDB (which has no conv()). Pass a hoisted md5 column, not
    md5(text) inline — inlining would re-hash 16x per row."""
    return (
        f"transform(sequence(0, 7), i ->"
        f" 16.0D * (instr('{_CE_HEX}', substring({col}, 2*i+1, 1)) - 1)"
        f" + (instr('{_CE_HEX}', substring({col}, 2*i+2, 1)) - 1))"
    )


def _hexvec_duck(col: str) -> str:
    return (
        f"list_transform(range(0, 8), i ->"
        f" 16.0 * (strpos('{_CE_HEX}', {col}[2*i+1]) - 1)"
        f" + (strpos('{_CE_HEX}', {col}[2*i+2]) - 1))"
    )


@register(
    "chunk_embed_topk",
    oracle=f"""
WITH chunks AS (
  SELECT doc_id, k AS chunk_idx,
         md5(substr(text, k * {_CE_CHUNK} + 1, {_CE_CHUNK})) AS h
  FROM documents,
       unnest(range(0, CAST(ceil(length(text) / {_CE_CHUNK}.0) AS BIGINT))) AS t(k)
), vec AS (
  SELECT doc_id, chunk_idx, {_hexvec_duck('h')} AS v FROM chunks
), emb AS (
  SELECT doc_id, chunk_idx, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM vec
), q AS (
  SELECT doc_id AS q_doc, chunk_idx AS q_idx, v AS q_v, nrm AS q_nrm
  FROM emb WHERE doc_id % 100 = 0
), scored AS (
  SELECT q.q_doc, q.q_idx, e.doc_id, e.chunk_idx,
         floor(list_reduce(list_transform(range(1, 9),
                   i -> q.q_v[i] * e.v[i]), (a, b) -> a + b)
               / (q.q_nrm * e.nrm) * 1000000 + 0.5) / 1000000 AS sim
  FROM q JOIN emb e ON e.doc_id <> q.q_doc
)
SELECT q_doc, q_idx, doc_id, chunk_idx, sim
FROM scored
QUALIFY row_number() OVER (PARTITION BY q_doc, q_idx
                           ORDER BY sim DESC, doc_id, chunk_idx) <= 3
""",
    survey_ref="L3,L4,P1",
    doc="composed pipeline: chunk docs -> hash embedding -> cosine top-3 retrieval",
)
def chunk_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed RAG-indexing pipeline as ONE declared query: chunk the
    corpus (row-local Generate), embed each chunk (here a deterministic
    md5-derived 8-dim vector standing in for a model encoder — the
    embedding seam is the same mapInPandas boundary `extract_features`
    owns), and retrieve top-3 chunks per query chunk by cosine.

    Scale shape: chunking+embedding pipeline inside the scan (no shuffle);
    the query side is a sampled subset that BROADCASTS (the corpus never
    shuffles for retrieval), and per-pair scoring is a map-side zip_with
    fold followed by a per-query top-k window — the brute baseline whose
    production twin is the IVF bucket path (`ann_ivf_topk`). Exact-int
    dot products (hex bytes 0-255) keep every sum order-independent;
    the one float divide is quantized floor(x*1e6+0.5)/1e6 identically
    in both engines."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    chunks = docs.select(
        "doc_id",
        F.explode(F.expr(chunk_array_expr("text"))).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.chunk")
    emb = (
        chunks.select("doc_id", "chunk_idx", F.md5("chunk").alias("h"))
        .select("doc_id", "chunk_idx", F.expr(_hexvec_spark("h")).alias("v"))
        .withColumn(
            "nrm",
            F.sqrt(
                F.expr("aggregate(transform(v, x -> x * x), 0D, (a, b) -> a + b)")
            ),
        )
    )
    q = emb.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_idx").alias("q_idx"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        emb.join(F.broadcast(q), F.col("doc_id") != F.col("q_doc"))
        .withColumn(
            "sim",
            F.expr(
                "floor(aggregate(zip_with(q_v, v, (x, y) -> x * y), 0D,"
                " (a, b) -> a + b) / (q_nrm * nrm) * 1000000 + 0.5) / 1000000"
            ),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("q_doc", "q_idx").orderBy(
        F.desc("sim"), "doc_id", "chunk_idx"
    )
    return (
        scored.select("q_doc", "q_idx", "doc_id", "chunk_idx", "sim")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Tokenizer-training statistics: BPE pair counts + vocabulary coverage.
# Both run over the word-frequency DICTIONARY, not the corpus: the first
# aggregation collapses 100 TB of text to vocabulary-sized state (the same
# move the keydict projection makes for distinct counts), and every later
# step — pair explode, coverage window — costs O(vocab), not O(corpus).
# ---------------------------------------------------------------------------


@register(
    "bpe_pair_stats",
    oracle="""
WITH words AS (
  SELECT w, COUNT(*) AS cnt
  FROM documents, unnest(regexp_extract_all(text, '[a-z]+')) AS t(w)
  GROUP BY w
)
SELECT substring(w, i, 2) AS pair, CAST(SUM(cnt) AS BIGINT) AS n
FROM words, unnest(range(1, length(w))) AS r(i)
WHERE length(w) >= 2
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
""",
    survey_ref="L4",
    doc="BPE tokenizer training, step one: top adjacent-symbol pair frequencies",
)
def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first merge-selection step of BPE tokenizer training: adjacent
    character-pair frequencies, weighted by word count. Corpus -> word
    dictionary (one shuffle on the word, map-side combined), then the pair
    Generate explodes the DICTIONARY — len(word)-1 rows per distinct word,
    independent of corpus size — and a second vocab-sized aggregation
    ranks pairs. The length >= 2 guard matters cross-engine: Spark's
    sequence(1, 0) is DESCENDING ([1, 0]), not empty, so an unguarded
    single-letter word would emit two phantom pairs (same class of edge as
    the chunk_embed_topk empty-text guard).
    """
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    words = (
        docs.select(
            F.explode(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )
    return pairs.orderBy(F.desc("n"), "pair").limit(20)


@register(
    "vocab_coverage",
    oracle="""
WITH words AS (
  SELECT w, COUNT(*) AS cnt
  FROM documents, unnest(regexp_extract_all(text, '[a-z]+')) AS t(w)
  GROUP BY w
), ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, w) AS rnk,
         SUM(cnt) OVER (ORDER BY cnt DESC, w
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS total
  FROM words
)
SELECT rnk AS vocab_size,
       floor(cum * 1000000.0 / total + 0.5) / 1000000 AS coverage
FROM ranked
WHERE rnk IN (10, 100, 1000)
""",
    survey_ref="L4,W3",
    doc="tokenizer vocabulary-size diagnostic: corpus token coverage at top-K vocab cuts",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of corpus tokens a top-K vocabulary covers — the
    standard diagnostic for choosing tokenizer vocab size. One corpus
    shuffle builds the word dictionary; the ranking window then runs over
    vocab-sized input. The global ORDER BY window is single-partition by
    construction — acceptable because its input is the dictionary (at most
    a few million rows at web scale), never the corpus; (cnt DESC, w)
    ordering makes rank and cumulative sum deterministic under ties.
    Coverage is quantized floor(x*1e6+0.5)/1e6 identically in both engines
    (the engine's standard cross-engine float rounding recipe)."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    words = (
        docs.select(
            F.explode(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    order = Window.orderBy(F.desc("cnt"), "w")
    ranked = words.select(
        F.row_number().over(order).alias("vocab_size"),
        F.sum("cnt").over(order.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    # CAST cum to DOUBLE before the arithmetic: Spark would otherwise run
    # the whole chain in DECIMAL (bigint * decimal-literal) and emit a
    # DECIMAL column where the DuckDB oracle emits DOUBLE — identical
    # values, driver-hash mismatch (the hybrid_search_rrf round-4 failure
    # class). With the cast, both engines run the same double-op sequence.
    return ranked.filter(F.col("vocab_size").isin(10, 100, 1000)).select(
        F.col("vocab_size").cast("bigint"),
        F.expr(
            "floor(CAST(cum AS DOUBLE) * 1000000.0 / total + 0.5) / 1000000"
        ).alias("coverage"),
    )


# Per-source document cap: at most K docs kept per source, by a
# deterministic priority. The standard anti-domination pass of crawl
# curation (per-domain quotas in CCNet/Gopher-style pipelines): without
# it, one boilerplate-heavy domain can swamp a mixture bucket.
_SOURCE_CAP_K = 3


@register(
    "source_cap",
    oracle=f"""
SELECT doc_id, source, n_chars, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS rnk
  FROM documents
)
WHERE rnk <= {_SOURCE_CAP_K}
""",
    survey_ref="L6,W4",
    doc=f"per-source document cap: keep top-{_SOURCE_CAP_K} docs per source by length",
)
def source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most K documents per source, ranked by a deterministic
    priority (n_chars DESC, doc_id) — per-domain caps, the anti-domination
    step of corpus assembly.

    Scale shape: one shuffle on the source key, and Spark plans the rank
    filter as WindowGroupLimit — each map task keeps only its local top-K
    per source before the exchange, so shuffle volume is bounded by
    K x #sources per task, not the corpus. Priority is a total order
    (doc_id tiebreak), so the kept set is engine-independent."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SOURCE_CAP_K)
        .select("doc_id", "source", "n_chars", F.col("rnk").cast("bigint"))
    )
