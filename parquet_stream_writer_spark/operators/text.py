"""Text-analysis operators over ``documents`` — the LLM-pipeline
text lane: token statistics, quality scoring, language identification,
document fingerprinting (winnowing), BPE-ish token counting, blocklist
redaction, sequence packing, benchmark decontamination, Gopher
repetition filtering, and tokenize-to-ids encoding.

All pure built-in expressions (split/explode/window/agg) — the token
explode is map-side; every aggregation is partial+final via Catalyst.
At 100 TB the explode multiplies rows ~100×, so these pipelines keep
the exploded relation narrow (doc_id + token only) and aggregate
immediately — no wide rows ever cross a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from parquet_stream_writer_spark.functions import (
    int_mean,
    pround,
    quant6,
    quantn,
    sql_int_mean,
    sql_quant6,
)
from parquet_stream_writer_spark.operators.dedup import _hex_prefix_int, _hex_to_int_sql
from parquet_stream_writer_spark.sources import load_table, scan_parallel

#: Tiny function-word list used for the stopword-ratio feature.
_STOPWORDS = ("the", "a", "of", "and", "in", "to")
#: Language-ID profile size (top tokens per language).
_PROFILE_K = 10


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )


_SQL_TOKENS = """
toks AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Token statistics
# ---------------------------------------------------------------------------

def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics: docs, tokens, vocabulary size,
    tokens/doc, mean token length."""
    toks = _tokens(spark, sf_dir)
    return toks.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("vocab"),
        pround(F.count(F.lit(1)) / F.countDistinct("doc_id"), 4).alias("tokens_per_doc"),
        pround(F.avg(F.length("tok")), 4).alias("avg_tok_len"),
    )


ORACLE_TEXT_TOKEN_STATS = f"""
WITH {_SQL_TOKENS}
SELECT lang,
       count(DISTINCT doc_id) AS n_docs,
       count(*)               AS n_tokens,
       count(DISTINCT tok)    AS vocab,
       floor((count(*) * 1.0 / count(DISTINCT doc_id)) * 10000 + 0.5) / 10000.0 AS tokens_per_doc,
       floor((avg(length(tok))) * 10000 + 0.5) / 10000.0                        AS avg_tok_len
FROM toks
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score.

    Features: token count, type/token ratio, stopword ratio, mean
    token length. Score = weighted blend, clamped to [0, 1] — the
    shape of a classic pre-training quality filter (length + lexical
    diversity + function-word prior).

    Shape (optimization r18, guide §2.4/§4.1): every feature is
    doc-grain, and a document's tokens are born on the document's own
    row — so the explode → groupBy(doc_id) → countDistinct pipeline
    (which shuffled every token occurrence twice: once into the
    (doc, tok) distinct aggregate, once into the doc-grain rollup) is
    replaced by per-row higher-order array expressions. Zero
    aggregation exchanges; the only exchange left is scan_parallel's
    conditional spread of the single-split local scan. Equivalence:
    ``size(split)`` counts exactly the rows explode emitted (explode
    drops NULL and EMPTY arrays; ``split`` never returns an empty
    array, so on non-NULL text — NULL is filtered here — explode
    never dropped a document);
    ``size(array_distinct)`` = countDistinct over non-null elements;
    the integer/long divisions produce bit-identical doubles.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id").where(
        F.col("text").isNotNull()
    )
    arr = F.split(F.lower("text"), " ")
    feats = docs.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(arr)).alias("n_uniq"),
        F.size(F.filter(arr, lambda t: t.isin(*_STOPWORDS))).alias("n_stop"),
        F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("len_sum"),
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("n_uniq") / F.col("n_tokens")).alias("uniq_ratio"),
        (F.col("n_stop") / F.col("n_tokens")).alias("stop_ratio"),
        (F.col("len_sum") / F.col("n_tokens")).alias("mean_tok_len"),
    )
    raw = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.col("uniq_ratio") * 0.3
        + F.least(F.col("stop_ratio") * F.lit(5.0), F.lit(1.0)) * 0.2
        + F.least(F.col("mean_tok_len") / F.lit(6.0), F.lit(1.0)) * 0.2
    )
    return feats.select(
        "doc_id",
        "n_tokens",
        pround(F.col("uniq_ratio"), 4).alias("uniq_ratio"),
        pround(F.col("stop_ratio"), 4).alias("stop_ratio"),
        pround(F.col("mean_tok_len"), 4).alias("mean_tok_len"),
        pround(raw, 4).alias("quality"),
    )


_SQL_STOPLIST = "(" + ", ".join(f"'{s}'" for s in _STOPWORDS) + ")"

ORACLE_TEXT_QUALITY_SCORE = f"""
WITH {_SQL_TOKENS},
feats AS (
  SELECT doc_id,
         count(*) AS n_tokens,
         count(DISTINCT tok) * 1.0 / count(*) AS uniq_ratio,
         sum(CASE WHEN tok IN {_SQL_STOPLIST} THEN 1 ELSE 0 END) * 1.0 / count(*) AS stop_ratio,
         avg(length(tok)) AS mean_tok_len
  FROM toks GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       floor(uniq_ratio * 10000 + 0.5) / 10000.0   AS uniq_ratio,
       floor(stop_ratio * 10000 + 0.5) / 10000.0   AS stop_ratio,
       floor(mean_tok_len * 10000 + 0.5) / 10000.0 AS mean_tok_len,
       floor((
           least(n_tokens / 100.0, 1.0) * 0.3
         + uniq_ratio * 0.3
         + least(stop_ratio * 5.0, 1.0) * 0.2
         + least(mean_tok_len / 6.0, 1.0) * 0.2
       ) * 10000 + 0.5) / 10000.0 AS quality
FROM feats
"""


# ---------------------------------------------------------------------------
# Language identification (train profiles → apply → confusion matrix)
# ---------------------------------------------------------------------------

def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-profile language ID: build top-K token profiles per
    labeled language, score each document by profile-token overlap,
    predict the argmax, report the confusion matrix.

    A two-phase train/apply pipeline expressed as joins: profiles are
    tiny (langs × K) and broadcast; the apply side is one semi-join +
    aggregation over the exploded tokens.
    """
    toks = _tokens(spark, sf_dir)
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tok"))
    profiles = (
        freq.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _PROFILE_K)
        .select(F.col("lang").alias("plang"), "tok")
    )
    doc_toks = toks.select("doc_id", "lang", "tok").distinct()
    scores = (
        doc_toks.join(F.broadcast(profiles), "tok")
        .groupBy("doc_id", "lang", "plang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    wbest = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("plang"))
    predicted = (
        scores.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("plang").alias("predicted"))
    )
    return predicted.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n_docs"))


ORACLE_TEXT_LANGID = f"""
WITH {_SQL_TOKENS},
freq AS (SELECT lang, tok, count(*) AS cnt FROM toks GROUP BY lang, tok),
profiles AS (
  SELECT lang AS plang, tok FROM (
    SELECT lang, tok, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC) AS rk
    FROM freq
  ) WHERE rk <= {_PROFILE_K}
),
doc_toks AS (SELECT DISTINCT doc_id, lang, tok FROM toks),
scores AS (
  SELECT d.doc_id, d.lang, p.plang, count(*) AS score
  FROM doc_toks d JOIN profiles p ON d.tok = p.tok
  GROUP BY d.doc_id, d.lang, p.plang
),
predicted AS (
  SELECT doc_id, lang, plang AS predicted FROM (
    SELECT doc_id, lang, plang,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang ASC) AS rk
    FROM scores
  ) WHERE rk = 1
)
SELECT lang, predicted, count(*) AS n_docs FROM predicted GROUP BY lang, predicted
"""


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowing)
# ---------------------------------------------------------------------------

def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints: hash 4-token k-grams to 32-bit ints,
    slide a window of 4 consecutive k-gram hashes keeping the minimum,
    dedup the kept mins per document. Output per-doc fingerprint count
    and extrema — the compact sketch a plagiarism/near-dup index
    stores.

    Fingerprints are fixed-width BIGINTs (integer prefix of the md5,
    portable across engines), not hex strings: every downstream
    shuffle carries 8 bytes instead of 32, and the final min/max
    aggregation stays a HashAggregate (var-length string buffers
    would demote it to a sort of the fingerprint stream).
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    kgram = F.when(
        F.lead("tok", 3).over(w).isNotNull(),
        F.md5(
            F.concat_ws(
                " ",
                F.col("tok"),
                F.lead("tok", 1).over(w),
                F.lead("tok", 2).over(w),
                F.lead("tok", 3).over(w),
            )
        ),
    )
    kg = (
        toks.select("doc_id", "pos", kgram.alias("kh_hex"))
        .where(F.col("kh_hex").isNotNull())
        .select("doc_id", "pos", _hex_prefix_int("kh_hex", 8).alias("kh"))
    )
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    fps = kg.select("doc_id", F.min("kh").over(wmin).alias("fp")).distinct()
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


ORACLE_TEXT_FINGERPRINT = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(text), ' ')) AS tok,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents
),
kg AS (
  SELECT doc_id, pos, {_hex_to_int_sql("kh_hex", 8)} AS kh FROM (
    SELECT doc_id, pos,
           CASE WHEN lead(tok, 3) OVER w IS NOT NULL THEN
             md5(tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                     || ' ' || lead(tok, 3) OVER w)
           END AS kh_hex
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE kh_hex IS NOT NULL
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           min(kh) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
    FROM kg
  )
)
SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp, max(fp) AS max_fp
FROM fps GROUP BY doc_id
"""


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
}

ORACLE = {
    "text_token_stats": ORACLE_TEXT_TOKEN_STATS,
    "text_quality_score": ORACLE_TEXT_QUALITY_SCORE,
    "text_langid": ORACLE_TEXT_LANGID,
    "text_fingerprint": ORACLE_TEXT_FINGERPRINT,
}


def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex tokenizer.

    Splits runs of letters, runs of digits, and single non-space
    symbols as separate tokens (the shape of GPT-style pre-tokenizers)
    and compares against the whitespace count — the standard
    tokens-per-document costing pass before training-data billing.

    A zero-token document (whitespace-only text) pins
    ``chars_per_token`` to NULL in BOTH engines: unguarded, Spark's
    ANSI mode raises DIVIDE_BY_ZERO at runtime and DuckDB's ``*1.0``
    double path gives ±∞ — the adversarial-corpus sweep (round 6
    session 4) caught the fork; the WHEN/CASE pair is the
    text_zipf_fit guard convention.
    """
    docs = load_table(spark, sf_dir, "documents")
    pattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("ws_tokens"),
        # group index 0 = whole match (Spark defaults to group 1;
        # DuckDB defaults to 0 — pin them equal)
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(pattern), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    ).withColumn(
        "chars_per_token",
        pround(
            F.when(
                F.col("bpe_tokens") > 0,
                F.col("n_chars") / F.col("bpe_tokens"),
            ),
            4,
        ),
    )


ORACLE_TEXT_TOKEN_COUNT_BPE = """
SELECT doc_id,
       CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) > 0 THEN
         floor((length(text) * 1.0 / len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) * 10000 + 0.5) / 10000.0 END
         AS chars_per_token
FROM documents
"""


QUERIES["text_token_count_bpe"] = text_token_count_bpe
ORACLE["text_token_count_bpe"] = ORACLE_TEXT_TOKEN_COUNT_BPE


#: Term blocklist for the redaction pass (word-boundary matched).
_BLOCKLIST = ("customer", "key", "vector")
_BLOCK_RE = r"\b(" + "|".join(_BLOCKLIST) + r")\b"


def text_blocklist_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist redaction: replace blocklisted terms with a
    ``[REDACTED]`` marker and account for the edits — the shape of a
    PII/unsafe-term scrub over a pretraining corpus. Pure JVM regex
    (``regexp_replace`` / ``regexp_extract_all``), map-side, no
    shuffle at all."""
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    pat = F.lit(_BLOCK_RE)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), pat, F.lit(0)))
        .cast("long")
        .alias("n_redactions"),
        F.length("text").cast("long").alias("chars_before"),
        F.length(F.regexp_replace("text", _BLOCK_RE, "[REDACTED]"))
        .cast("long")
        .alias("chars_after"),
    )


ORACLE_TEXT_BLOCKLIST_REDACT = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BLOCK_RE}')) AS BIGINT) AS n_redactions,
       CAST(length(text) AS BIGINT) AS chars_before,
       CAST(length(regexp_replace(text, '{_BLOCK_RE}', '[REDACTED]', 'g')) AS BIGINT) AS chars_after
FROM documents
"""


#: Token budget per packed training sequence.
_PACK_BUDGET = 512


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-then-chunk): documents are laid out in
    doc_id order on a token axis; a document belongs to the chunk
    where it starts (``floor(start_offset / budget)``). Reports per
    chunk: docs packed, tokens, fill ratio — the packing-efficiency
    audit before pretraining.

    Two-pass distributed prefix sum (same shape as
    ``sample_global_shuffle``): range-bucket doc_id into a FIXED number
    of buckets, aggregate per-bucket token totals, turn those into
    bucket start offsets via a bucket-count-sized window (256 rows,
    never corpus-sized), broadcast the offsets back, and finish with a
    per-bucket partitioned running sum.  cum = offset + in-bucket
    cumsum; no unpartitioned corpus-wide window anywhere.

    Accepted cost: locally this runs ~0.44s vs ~0.2s for the
    single-partition-window shape it replaced (round 3) — the extra
    bucket aggregate+broadcast buys the plan that still works when
    the corpus doesn't fit one task.  Plan-pinned in
    tests/test_plans.py::test_pack_sequences_bucketed_prefix_sum_shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tok")
    )
    nb = 256
    n = toks.groupBy().agg((F.max("doc_id") + 1).alias("n_docs"))
    bucketed = toks.crossJoin(F.broadcast(n)).withColumn(
        "b",
        F.least(
            F.lit(nb - 1), F.floor(F.col("doc_id") * nb / F.col("n_docs"))
        ).cast("int"),
    )
    per_bucket = bucketed.groupBy("b").agg(F.sum("n_tok").alias("tok_sum"))
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "b", F.coalesce(F.sum("tok_sum").over(wo), F.lit(0)).alias("offset")
    )
    wb = (
        Window.partitionBy("b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = (
        bucketed.join(F.broadcast(offsets), "b")
        .withColumn("cum", F.col("offset") + F.sum("n_tok").over(wb))
        .withColumn(
            "chunk_id",
            F.floor((F.col("cum") - F.col("n_tok")) / _PACK_BUDGET).cast("long"),
        )
    )
    return placed.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_TEXT_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
  FROM documents
),
placed AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM toks
)
SELECT CAST(floor((cum - n_tok) / {_PACK_BUDGET}) AS BIGINT) AS chunk_id,
       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM placed GROUP BY 1
"""


QUERIES["text_blocklist_redact"] = text_blocklist_redact
QUERIES["text_pack_sequences"] = text_pack_sequences
ORACLE["text_blocklist_redact"] = ORACLE_TEXT_BLOCKLIST_REDACT
ORACLE["text_pack_sequences"] = ORACLE_TEXT_PACK_SEQUENCES


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------

def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: flag corpus documents whose
    distinct-3-gram overlap with a held-out benchmark set exceeds 5%.

    The benchmark partition (here ``doc_id % 97 = 0``, standing in for
    an eval suite) is tiny relative to the corpus by construction, so
    its distinct n-gram set is **broadcast** — the 100 TB corpus side
    is scanned once, n-grams generated map-side (array ``transform``
    over the token array, no explode-shuffle), and the only shuffle is
    the final per-document aggregate. This is the standard
    train/eval-overlap decontamination pass every LLM data pipeline
    runs before training.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    # Optimization r18 (guide §2.3/§4.1): de-duplicate each document's
    # n-grams IN-ROW (array_distinct before the explode) — the per-doc
    # rollup then needs plain count/sum instead of two countDistincts,
    # deleting the Expand (which doubled every joined row into the
    # aggregate) and shrinking the exploded stream to distinct grams.
    with_ngrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(split(lower(text), ' ')) >= 3 THEN "
                "array_distinct("
                "transform(sequence(1, size(split(lower(text), ' ')) - 2), "
                "  i -> array_join(slice(split(lower(text), ' '), i, 3), ' '))) "
                "ELSE array() END"
            )
        ).alias("ngram"),
    )
    bench = (
        with_ngrams.where(F.col("doc_id") % 97 == 0).select("ngram").distinct()
    ).withColumn("hit", F.lit(1))
    corpus = with_ngrams.where(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_contam"),
        )
        .where(F.col("n_contam") * 1.0 / F.col("n_ngrams") > 0.05)
        .select(
            "doc_id",
            "n_ngrams",
            "n_contam",
            pround(F.col("n_contam") * 1.0 / F.col("n_ngrams"), 6).alias("contam_frac"),
        )
    )


ORACLE_TEXT_CONTAMINATION = """
WITH toksd AS (SELECT doc_id, string_split(lower(text),' ') AS toks FROM documents),
ngrams AS (
  SELECT doc_id,
         unnest([array_to_string(toks[i:i+2],' ') for i in range(1, greatest(len(toks)-1,1))]) AS ngram
  FROM toksd),
bench AS (SELECT DISTINCT ngram FROM ngrams WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, ngram FROM ngrams WHERE doc_id % 97 <> 0)
SELECT c.doc_id,
       count(DISTINCT c.ngram) AS n_ngrams,
       count(DISTINCT CASE WHEN b.ngram IS NOT NULL THEN c.ngram END) AS n_contam,
       floor((count(DISTINCT CASE WHEN b.ngram IS NOT NULL THEN c.ngram END) * 1.0
              / count(DISTINCT c.ngram)) * 1000000 + 0.5) / 1000000.0 AS contam_frac
FROM corpus c LEFT JOIN bench b ON c.ngram = b.ngram
GROUP BY c.doc_id
HAVING count(DISTINCT CASE WHEN b.ngram IS NOT NULL THEN c.ngram END) * 1.0
       / count(DISTINCT c.ngram) > 0.05
"""


# ---------------------------------------------------------------------------
# Repetition-ratio quality filter (Gopher rules)
# ---------------------------------------------------------------------------

def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition features per document: top-token
    dominance and duplicate-bigram fraction.

    Entirely shuffle-free: every feature is an array expression
    (``transform`` / ``array_distinct`` / ``filter``) over the
    in-row token array — a narrow map over the scan, which is the
    only plan shape that survives a 100 TB corpus (any per-token
    explode+groupBy would shuffle the full token stream). Vocab is
    small so the O(|vocab|·n) mode computation is cheap per row.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.split(F.lower("text"), " ")
    max_tok_cnt = F.expr(
        "array_max(transform(array_distinct(split(lower(text), ' ')), "
        "  t -> size(filter(split(lower(text), ' '), x -> x = t))))"
    )
    # Guarded for single-token docs: Spark's sequence(1, 0) counts
    # DOWN (slice(…, 0) crash); DuckDB's range(1, 1) is empty.
    bigrams = F.expr(
        "case when size(split(lower(text), ' ')) >= 2 then "
        "transform(sequence(1, size(split(lower(text), ' ')) - 1), "
        "  i -> array_join(slice(split(lower(text), ' '), i, 2), ' ')) "
        "else cast(array() as array<string>) end"
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        pround(max_tok_cnt * 1.0 / F.size(toks), 6).alias("top_tok_frac"),
        pround(
            (F.size(bigrams) - F.size(F.array_distinct(bigrams)))
            * 1.0
            / F.greatest(F.size(bigrams), F.lit(1)),
            6,
        ).alias("dup_bigram_frac"),
    )


ORACLE_TEXT_REPETITION = """
WITH feat AS (
  SELECT doc_id, string_split(lower(text),' ') AS toks,
         len(string_split(lower(text),' ')) AS n_tok,
         list_max([len(list_filter(toks, x -> x = t)) for t in list_distinct(toks)]) AS max_tok_cnt,
         [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bigrams
  FROM documents)
SELECT doc_id, n_tok,
       floor((max_tok_cnt * 1.0 / n_tok) * 1000000 + 0.5) / 1000000.0 AS top_tok_frac,
       floor(((len(bigrams) - len(list_distinct(bigrams))) * 1.0
              / greatest(len(bigrams),1)) * 1000000 + 0.5) / 1000000.0 AS dup_bigram_frac
FROM feat
"""


QUERIES["text_contamination_ngram"] = text_contamination_ngram
QUERIES["text_repetition_gopher"] = text_repetition_gopher
ORACLE["text_contamination_ngram"] = ORACLE_TEXT_CONTAMINATION
ORACLE["text_repetition_gopher"] = ORACLE_TEXT_REPETITION


# ---------------------------------------------------------------------------
# Tokenize-to-ids (vocab build + encode)
# ---------------------------------------------------------------------------

def text_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-prep encode step: build a frequency-ranked vocab
    (top 30 tokens, deterministic count-then-lexical tiebreak) and map
    every document to (pos, token, id) rows; out-of-vocab → id 0.

    The vocab is an aggregate of the full token stream but is tiny by
    construction, so it **broadcasts** back onto the exploded tokens —
    corpus-side data never reshuffles for the encode. At 100 TB this
    is the canonical two-pass shape: one partial+final agg for the
    vocab (bytes of output), one broadcast-join map pass to encode.
    The top-30 selection is a ``limit`` (TakeOrderedAndProject) so the
    corpus-vocabulary-sized count table is never single-partitioned;
    only the 30 winners see a rank window.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # Top-30 by (count desc, tok asc) via limit → TakeOrderedAndProject
    # (per-partition top-k + merge), NOT a row_number window over the
    # full corpus-vocabulary-sized count table — that would funnel all
    # distinct tokens through one partition just to discard them.
    # Only the 30 surviving rows get the (now trivially small) rank
    # window.
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(30)
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    vocab = top.withColumn("tok_id", F.row_number().over(w).cast("int")).select(
        "tok", "tok_id"
    )
    return toks.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "tok",
        F.coalesce("tok_id", F.lit(0)).cast("int").alias("tok_id"),
    )


ORACLE_TEXT_TOKENIZE_IDS = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(text),' ')) AS tok,
         generate_subscripts(string_split(lower(text),' '), 1) AS pos
  FROM documents),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS INTEGER) AS tok_id
  FROM counts QUALIFY row_number() OVER (ORDER BY n DESC, tok ASC) <= 30)
SELECT t.doc_id, t.pos, t.tok, coalesce(v.tok_id, 0) AS tok_id
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
"""


QUERIES["text_tokenize_ids"] = text_tokenize_ids
ORACLE["text_tokenize_ids"] = ORACLE_TEXT_TOKENIZE_IDS


# ---------------------------------------------------------------------------
# Duplicated-span fraction (exact-substring dedup signal)
# ---------------------------------------------------------------------------

def text_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of 8-gram token spans that occur in more
    than one document — the Lee-et-al exact-substring dedup signal at
    fixed-gram granularity. Spans are md5-hashed to fixed-width 48-bit
    ints *before* the shuffle (both engines use the identical digest,
    so the rare hash collision merges the same spans on both sides):
    the global gram-frequency agg and the join back stay hash-based
    and move 8 bytes per gram instead of ~50-byte strings. Flagged =
    more than 5% of a doc's spans appear elsewhere."""
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= 8
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 7),"
                " i -> md5(array_join(slice(t, i, 8), ' ')))"
            )
        ).alias("gh"),
    ).select("doc_id", _hex_prefix_int("gh", 12).alias("g"))
    # Optimization r18 (guide §5): the hashed span stream feeds the
    # document-frequency aggregate AND the join back — checkpoint so
    # the tokenize + md5 pass runs once.
    grams = grams.localCheckpoint(eager=False)
    gcount = grams.groupBy("g").agg(F.countDistinct("doc_id").alias("nd"))
    return (
        grams.join(gcount, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup",
            (F.col("n_dup") / F.col("n_grams")).alias("dup_frac"),
            (F.col("n_dup") / F.col("n_grams") > 0.05).alias("flagged"),
        )
    )


ORACLE_TEXT_DUP_SPAN = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 8),
grams AS (
  SELECT doc_id,
         unnest([md5(array_to_string(t[i:i+7], ' '))
                 for i in generate_series(1, len(t) - 7)]) AS gh
  FROM toks),
g AS (SELECT doc_id, {_hex_to_int_sql('gh', 12)} AS g FROM grams),
gcount AS (SELECT g, count(DISTINCT doc_id) AS nd FROM g GROUP BY g),
per_doc AS (
  SELECT doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
  FROM g JOIN gcount USING (g) GROUP BY doc_id)
SELECT doc_id, n_grams, n_dup,
       n_dup / n_grams AS dup_frac,
       n_dup / n_grams > 0.05 AS flagged
FROM per_doc
"""


QUERIES["text_dup_span_fraction"] = text_dup_span_fraction
ORACLE["text_dup_span_fraction"] = ORACLE_TEXT_DUP_SPAN


# ---------------------------------------------------------------------------
# Unigram-LM perplexity proxy
# ---------------------------------------------------------------------------

def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring with a corpus-trained unigram LM: token
    surprisal is -ln(count/total) from one global frequency pass, and
    each doc is scored by its mean surprisal (high = improbable text).
    The vocabulary agg is tiny (distinct tokens) and broadcasts back
    over the exploded token stream — the same two-pass train/apply
    shape as ``text_tokenize_ids``, with the totals row carried on the
    broadcast side so no second scan of the corpus is needed.

    Arithmetic (round-13 migration of the fractional-avg latent class,
    scheduled in the round-12 record): each token's surprisal
    quantizes to a 1e-6-unit LONG before any aggregation, the per-doc
    mean is one division of exact integers — no double ever
    accumulates in partition order, so the 6-dp output is
    deterministic under any shuffle layout.  The value is
    mathematically the mean of the quantized surprisals (±5e-7 per
    token vs the old float mean); impl and oracle changed together.

    Optimization r18 note: a (doc, tok) → multiplicity pre-aggregate
    feeding both the vocab agg and the scoring join was measured here
    and REVERTED — the original's single groupBy(doc_id) already
    collapses map-side (the shuffle carries ~one row per partition ×
    doc), so the pre-aggregate ADDED an exchange and ran ~15% slower
    at sf0.1. The double tokenize is map-side and cheap next to it."""
    toks = _tokens(spark, sf_dir).select("doc_id", "tok")
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    scored = toks.join(F.broadcast(vocab.crossJoin(tot)), "tok").select(
        "doc_id",
        quant6(-F.log(F.col("c") / F.col("n"))).alias("nll6"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        pround(
            F.sum("nll6") / (F.count(F.lit(1)) * 1000000.0), 6
        ).alias("avg_neg_logp"),
    )


ORACLE_TEXT_PERPLEXITY = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         CAST(floor(-ln(v.c / tot.n) * 1000000 + 0.5) AS BIGINT) AS nll6
  FROM toks t JOIN vocab v USING (tok), tot)
SELECT doc_id, count(*) AS n_tokens,
       floor(CAST(sum(nll6) AS DOUBLE) / (count(*) * 1000000.0)
             * 1000000 + 0.5) / 1000000.0 AS avg_neg_logp
FROM scored GROUP BY doc_id
"""


QUERIES["text_perplexity_proxy"] = text_perplexity_proxy
ORACLE["text_perplexity_proxy"] = ORACLE_TEXT_PERPLEXITY


# ---------------------------------------------------------------------------
# Sliding-window chunking
# ---------------------------------------------------------------------------

def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/pretraining chunker: overlapping 16-token windows with
    stride 8 per document. Chunk starts come from ``sequence`` (no
    join, no shuffle — pure map-side explode of a generated range),
    so at 100 TB this is a single narrow pass whose output lands
    directly in the sink; contrast ``text_pack_sequences``, which
    packs *across* docs and needs a global prefix sum. Runt chunks
    (<4 tokens) are dropped."""
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    chunks = toks.select(
        "doc_id",
        F.explode(F.expr("sequence(1, greatest(size(t) - 7, 1), 8)")).alias("start"),
        "t",
    )
    return (
        chunks.select(
            "doc_id",
            ((F.col("start") - 1) / 8).cast("int").alias("chunk_idx"),
            F.expr("array_join(slice(t, start, 16), ' ')").alias("chunk_text"),
            F.expr("size(slice(t, start, 16))").cast("int").alias("n_tokens"),
        )
        .where(F.col("n_tokens") >= 4)
    )


ORACLE_TEXT_CHUNK_WINDOWS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(t) - 7, 1), 8)) AS start,
         t
  FROM toks)
SELECT doc_id, CAST((start - 1) / 8 AS INTEGER) AS chunk_idx,
       array_to_string(t[start:start+15], ' ') AS chunk_text,
       CAST(len(t[start:start+15]) AS INTEGER) AS n_tokens
FROM chunks
WHERE len(t[start:start+15]) >= 4
"""


QUERIES["text_chunk_windows"] = text_chunk_windows
ORACLE["text_chunk_windows"] = ORACLE_TEXT_CHUNK_WINDOWS


# ---------------------------------------------------------------------------
# TF-IDF top-term extraction
# ---------------------------------------------------------------------------

def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document's most characteristic term by TF-IDF. Two tiny
    vocabulary-sized aggs (term frequency per doc, document frequency
    per term) plus a broadcast join carry the whole computation; the
    per-doc argmax is a WindowGroupLimit-prunable row_number. Scores
    are rounded to 6dp *before* ranking so the (tfidf, term) order —
    and therefore the winner — is identical across engines."""
    toks = _tokens(spark, sf_dir).select("doc_id", "tok")
    docs = load_table(spark, sf_dir, "documents")
    # Optimization r18 note: a lazy localCheckpoint on tf was measured
    # and REVERTED (warm wash, cold worse — the barrier serialized two
    # cheap parallel subtrees; the fk-audit lesson).
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("f"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(F.broadcast(dfreq.crossJoin(n)), "tok").select(
        "doc_id",
        "tok",
        pround(
            F.col("f") * F.log(F.col("n_docs") / F.col("dfreq")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_term"), "tfidf")
    )


ORACLE_TEXT_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
tf AS (
  SELECT doc_id, tok, count(*) AS f FROM toks GROUP BY doc_id, tok),
df AS (
  SELECT tok, count(*) AS dfreq FROM tf GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.tok,
         floor(t.f * ln(n.n_docs / dfreq) * 1000000 + 0.5) / 1000000.0 AS tfidf
  FROM tf t JOIN df USING (tok), n)
SELECT doc_id, tok AS top_term, tfidf
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) = 1
"""


QUERIES["text_tfidf_top_term"] = text_tfidf_top_term
ORACLE["text_tfidf_top_term"] = ORACLE_TEXT_TFIDF


# ---------------------------------------------------------------------------
# Winsorized quality statistics
# ---------------------------------------------------------------------------

def text_winsorize_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorized length statistics: clip ``n_chars`` at
    the language's exact p05/p95 and report raw vs clipped means — the
    outlier-robust normalization step quality filters run before
    thresholding, so one 10 MB pathological document can't drag a
    language's mean.  Quantiles are one aggregation over the stats
    column; the clip is a broadcast join back (the quantile table has
    one row per language — never corpus-sized).

    Exactness discipline (round 14): the raw mean averages INTEGER
    char counts (every partial sum an exact integer below 2^53 —
    order-free by construction), but the clipped values inherit the
    FRACTIONAL p05/p95 interpolated quantiles, so their float sum was
    partition-order dependent.  The clipped values now quantize to
    1e-4-unit LONGs before the mean; mean_winsorized divides the
    exact integer sum once (Σc₄/(10⁴·n), 4-dp floored).  Exact while
    a language's Σ|clipped|·1e4 stays inside int64 (~9e8 docs of
    1e6-char clipped length per language)."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    clipped = docs.join(F.broadcast(q), "lang").withColumn(
        "c4",
        quantn(
            F.least(
                F.greatest(F.col("n_chars").cast("double"), F.col("lo")),
                F.col("hi"),
            ),
            4,
        ),
    )
    return clipped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        pround(F.avg("n_chars"), 4).alias("mean_raw"),
        pround(
            F.sum("c4") / (F.count(F.lit(1)) * F.lit(10000)), 4
        ).alias("mean_winsorized"),
        pround(F.min("lo"), 4).alias("p05"),
        pround(F.max("hi"), 4).alias("p95"),
    )


ORACLE_TEXT_WINSORIZE_QUALITY = """
WITH q AS (
  SELECT lang,
         quantile_cont(n_chars, 0.05) AS lo,
         quantile_cont(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang
)
SELECT d.lang,
       count(*) AS n_docs,
       floor(avg(d.n_chars) * 10000 + 0.5) / 10000.0 AS mean_raw,
       floor(sum(CAST(floor(least(greatest(CAST(d.n_chars AS DOUBLE), q.lo), q.hi)
                            * 10000 + 0.5) AS BIGINT))
             / (count(*) * 10000) * 10000 + 0.5) / 10000.0
         AS mean_winsorized,
       floor(min(q.lo) * 10000 + 0.5) / 10000.0 AS p05,
       floor(max(q.hi) * 10000 + 0.5) / 10000.0 AS p95
FROM documents d JOIN q USING (lang)
GROUP BY d.lang
"""


QUERIES["text_winsorize_quality"] = text_winsorize_quality
ORACLE["text_winsorize_quality"] = ORACLE_TEXT_WINSORIZE_QUALITY


# ---------------------------------------------------------------------------
# PII-style numeric scrubbing (runs on events.props — the digit-bearing
# free-text column of the corpus)
# ---------------------------------------------------------------------------

def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub digit runs from the ``props`` payloads (the stand-in for
    PII removal: phone/account/ID numbers) and audit the impact per
    event type: match counts and byte deltas.  Pure map-side
    ``regexp_replace`` + one aggregation — the redaction itself never
    shuffles; only the tiny audit rollup does."""
    ev = load_table(spark, sf_dir, "events")
    scrubbed = F.regexp_replace(F.col("props"), "[0-9]+", "<NUM>")
    per_row = ev.select(
        "event_type",
        F.size(F.expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("long").alias("n_num"),
        F.length("props").cast("long").alias("len_raw"),
        F.length(scrubbed).cast("long").alias("len_scrubbed"),
    )
    return per_row.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("n_num").alias("n_numbers"),
        F.sum("len_raw").alias("total_len_raw"),
        F.sum("len_scrubbed").alias("total_len_scrubbed"),
    )


ORACLE_TEXT_PII_SCRUB = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_numbers,
       CAST(sum(length(props)) AS BIGINT) AS total_len_raw,
       CAST(sum(length(regexp_replace(props, '[0-9]+', '<NUM>', 'g'))) AS BIGINT)
         AS total_len_scrubbed
FROM events
GROUP BY event_type
"""


QUERIES["text_pii_scrub"] = text_pii_scrub
ORACLE["text_pii_scrub"] = ORACLE_TEXT_PII_SCRUB


# ---------------------------------------------------------------------------
# Quality-filter funnel (chained curation filters with drop accounting)
# ---------------------------------------------------------------------------

#: Funnel thresholds, expressed as integer ratios (pct) so every stage
#: predicate is exact integer arithmetic — no float drift between
#: engines. Chosen so each stage drops a real slice of this corpus.
_FUNNEL_MIN_CHARS = 120
_FUNNEL_MAX_DUP_BIGRAM_PCT = 5    # dup-bigram fraction <= 5%
_FUNNEL_MAX_TOP_TOK_PCT = 12      # top-token dominance <= 12%
_FUNNEL_MIN_STOPWORD_PCT = 2      # stopword ratio >= 2%


def funnel_feature_cols() -> list:
    """The per-document funnel feature columns, shared by the funnel
    and the fused curation pipeline (``pipeline_curation_e2e``) so a
    threshold/expression change can never desync the two.

    The bigram array is guarded for single-token documents: Spark's
    ``sequence(1, 0)`` counts DOWN (yielding [1, 0] and a slice(…, 0)
    crash), while DuckDB's ``range(1, 1)`` is empty — the guard makes
    both engines agree on zero bigrams.
    """
    toks = "split(lower(text), ' ')"
    bigrams = (
        f"case when size({toks}) >= 2 then "
        f"transform(sequence(1, size({toks}) - 1), "
        f"  i -> array_join(slice({toks}, i, 2), ' ')) "
        f"else cast(array() as array<string>) end"
    )
    stop_arr = "array" + str(tuple(_STOPWORDS)).replace('"', "'")
    return [
        F.expr(f"size({toks})").alias("n_tok"),
        F.expr(
            f"array_max(transform(array_distinct({toks}), "
            f"  t -> size(filter({toks}, x -> x = t))))"
        ).alias("max_tok_cnt"),
        F.expr(f"size({bigrams})").alias("n_bigrams"),
        F.expr(f"size(array_distinct({bigrams}))").alias("n_distinct_bigrams"),
        F.expr(f"size(filter({toks}, t -> array_contains({stop_arr}, t)))").alias(
            "n_stop"
        ),
    ]


def funnel_stage_preds() -> list:
    """Cumulative stage predicates [s1, s2, s3, s4] over the columns
    produced by :func:`funnel_feature_cols`; ``funnel_stage_preds()[-1]``
    is the full quality gate."""
    s1 = F.col("n_chars") >= _FUNNEL_MIN_CHARS
    s2 = s1 & (
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")) * 100
        <= _FUNNEL_MAX_DUP_BIGRAM_PCT * F.col("n_bigrams")
    )
    s3 = s2 & (F.col("max_tok_cnt") * 100 <= _FUNNEL_MAX_TOP_TOK_PCT * F.col("n_tok"))
    s4 = s3 & (F.col("n_stop") * 100 >= _FUNNEL_MIN_STOPWORD_PCT * F.col("n_tok"))
    return [s1, s2, s3, s4]


#: Oracle twins of the stage predicates (over the SQL feature CTE's
#: columns); cumulative AND-prefixes mirror ``funnel_stage_preds``.
SQL_STAGE_PREDS = [
    f"n_chars >= {_FUNNEL_MIN_CHARS}",
    f"(n_bigrams - n_distinct_bigrams) * 100 <= {_FUNNEL_MAX_DUP_BIGRAM_PCT} * n_bigrams",
    f"max_tok_cnt * 100 <= {_FUNNEL_MAX_TOP_TOK_PCT} * n_tok",
    f"n_stop * 100 >= {_FUNNEL_MIN_STOPWORD_PCT} * n_tok",
]


def sql_quality_pred() -> str:
    """The full 4-stage quality gate as one SQL predicate."""
    return "(" + " AND ".join(SQL_STAGE_PREDS) + ")"


def sql_funnel_feats(extra_feat: str = "", extra_f2: str = "") -> str:
    """Oracle twin of :func:`funnel_feature_cols` as a ``feat``/``f2``
    CTE pair. ``extra_feat``/``extra_f2`` thread additional columns
    through each CTE (both must end with a trailing comma when set)."""
    return f"""feat AS (
  SELECT doc_id, n_chars, {extra_feat}
         string_split(lower(text), ' ') AS toks,
         len(string_split(lower(text), ' ')) AS n_tok,
         [toks[i] || ' ' || toks[i+1]
          for i in range(1, len(string_split(lower(text), ' ')))] AS bigrams
  FROM documents),
f2 AS (
  SELECT doc_id, n_chars, n_tok, {extra_f2}
         list_max([len(list_filter(toks, x -> x = t)) for t in list_distinct(toks)]) AS max_tok_cnt,
         len(bigrams) AS n_bigrams,
         len(list_distinct(bigrams)) AS n_distinct_bigrams,
         len(list_filter(toks, t -> list_contains({list(_STOPWORDS)!r}, t))) AS n_stop
  FROM feat)"""


def text_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel every pretraining corpus goes through:
    length → repetition → top-token dominance → stopword-density
    filters applied in sequence, with per-stage kept/dropped
    accounting (the numbers a data card reports).

    Every stage predicate is a shuffle-free array expression over the
    in-row token array, compared with integer cross-multiplication
    (``dup_bigrams * 100 <= 5 * n_bigrams``) so both engines decide
    boundaries identically. The whole funnel is ONE map pass + one
    4-value aggregate: adding stages adds columns, not passes — at
    100 TB the corpus is read once regardless of funnel depth.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    feats = docs.select("doc_id", "n_chars", *funnel_feature_cols())
    s1, s2, s3, s4 = funnel_stage_preds()
    one = F.count(F.lit(1))
    agg = feats.agg(
        one.alias("c0"),
        F.sum(s1.cast("long")).alias("c1"),
        F.sum(s2.cast("long")).alias("c2"),
        F.sum(s3.cast("long")).alias("c3"),
        F.sum(s4.cast("long")).alias("c4"),
    )
    funnel = agg.select(
        F.expr(
            "stack(4, "
            "1, 'min_length',        c0, c1, "
            "2, 'dup_bigram_frac',   c1, c2, "
            "3, 'top_token_frac',    c2, c3, "
            "4, 'stopword_density',  c3, c4) "
            "AS (stage_idx, stage, docs_in, docs_kept)"
        )
    )
    return funnel.select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("docs_in").cast("long").alias("docs_in"),
        F.col("docs_kept").cast("long").alias("docs_kept"),
        (F.col("docs_in") - F.col("docs_kept")).cast("long").alias("docs_dropped"),
    )


_SQL_FLAG_COLS = ",\n    ".join(
    "(" + " AND ".join(SQL_STAGE_PREDS[: i + 1]) + f") AS s{i + 1}"
    for i in range(len(SQL_STAGE_PREDS))
)

ORACLE_TEXT_QUALITY_FILTER_FUNNEL = f"""
WITH {sql_funnel_feats()},
flags AS (
  SELECT
    {_SQL_FLAG_COLS}
  FROM f2),
counts AS (
  SELECT CAST(count(*) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
  FROM flags)
SELECT CAST(1 AS INTEGER) AS stage_idx, 'min_length' AS stage,
       c0 AS docs_in, c1 AS docs_kept, c0 - c1 AS docs_dropped FROM counts
UNION ALL
SELECT 2, 'dup_bigram_frac',  c1, c2, c1 - c2 FROM counts
UNION ALL
SELECT 3, 'top_token_frac',   c2, c3, c2 - c3 FROM counts
UNION ALL
SELECT 4, 'stopword_density', c3, c4, c3 - c4 FROM counts
"""


QUERIES["text_quality_filter_funnel"] = text_quality_filter_funnel
ORACLE["text_quality_filter_funnel"] = ORACLE_TEXT_QUALITY_FILTER_FUNNEL


# ---------------------------------------------------------------------------
# Sequence-packing efficiency report
# ---------------------------------------------------------------------------

#: Context length for the packing-efficiency report (tokens per
#: training sequence). Small enough that documents of this corpus
#: span 1-4 sequences, exercising the ceil arithmetic.
_PACK_SEQ_LEN = 32


def text_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report per language: how much context-window
    budget padding wastes under one-doc-per-sequence versus
    concat-and-chunk packing at ``_PACK_SEQ_LEN`` tokens — the number
    that decides whether a packing stage is worth running.

    One map pass (token counts from the in-row array) + one hash
    aggregate; the ceil arithmetic is integer division on both
    engines, and the efficiency ratios are the only floats (rounded
    4-dp via the shared convention).
    """
    L = _PACK_SEQ_LEN
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    per_doc = docs.select(
        "lang", F.expr("size(split(lower(text), ' '))").cast("long").alias("n_tok")
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(F.expr(f"(n_tok + {L - 1}) div {L}")).alias("naive_seqs"),
    )
    return agg.withColumn(
        "packed_seqs", F.expr(f"(total_tokens + {L - 1}) div {L}")
    ).select(
        "lang",
        "n_docs",
        "total_tokens",
        "naive_seqs",
        "packed_seqs",
        pround(F.col("total_tokens") / (F.col("naive_seqs") * L), 4).alias("naive_eff"),
        pround(F.col("total_tokens") / (F.col("packed_seqs") * L), 4).alias(
            "packed_eff"
        ),
    )


ORACLE_TEXT_PACK_EFFICIENCY = f"""
WITH per_doc AS (
  SELECT lang, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
  FROM documents),
agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(sum((n_tok + {_PACK_SEQ_LEN - 1}) // {_PACK_SEQ_LEN}) AS BIGINT) AS naive_seqs
  FROM per_doc GROUP BY lang)
SELECT lang, n_docs, total_tokens, naive_seqs,
       (total_tokens + {_PACK_SEQ_LEN - 1}) // {_PACK_SEQ_LEN} AS packed_seqs,
       floor((total_tokens * 1.0 / (naive_seqs * {_PACK_SEQ_LEN})) * 10000 + 0.5) / 10000.0 AS naive_eff,
       floor((total_tokens * 1.0 / (((total_tokens + {_PACK_SEQ_LEN - 1}) // {_PACK_SEQ_LEN}) * {_PACK_SEQ_LEN})) * 10000 + 0.5) / 10000.0 AS packed_eff
FROM agg
"""


QUERIES["text_pack_efficiency"] = text_pack_efficiency
ORACLE["text_pack_efficiency"] = ORACLE_TEXT_PACK_EFFICIENCY


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law measurement)
# ---------------------------------------------------------------------------

#: Number of corpus prefixes on the vocabulary-growth curve.
_VOCAB_CURVE_POINTS = 10


def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law measurement: vocabulary size as a function of corpus
    size, at ``_VOCAB_CURVE_POINTS`` doc-count prefixes of the corpus
    (in doc_id order) — the curve that tells you whether more data
    keeps buying new vocabulary or has saturated.

    Cumulative-distinct is not windowable at scale; the trick is that
    a token contributes to prefix k iff its FIRST occurrence (min
    doc_id) falls inside — so one hash aggregate per distinct token
    (min doc_id), a map-side bucket assignment, one tiny aggregate,
    and a running sum over the ``_VOCAB_CURVE_POINTS``-row result.
    Token totals per prefix ride the same pattern on the raw stream.

    Optimization r19 (guide §2.4/§4.1): the tokenize explode runs
    ONCE (feeding only ``first_seen``) instead of three times — the
    doc-count 1-row aggregate and the per-bucket token totals need
    only per-document arithmetic, so they read a map-side
    ``size(split(...))`` doc-grain relation with no Generate.
    Equivalence: ``split`` on non-NULL text always yields ≥ 1 element
    (explode dropped only NULL-text docs, which ``where(isNotNull)``
    reproduces), and the element COUNT of the split array is exactly
    the exploded row count per doc, so max(doc_id), bucket token
    sums, and first-occurrence minima are bit-identical.
    """
    n = _VOCAB_CURVE_POINTS
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    # Doc-grain token counts, map-side (no explode): |split(text)|.
    per_doc = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tok"),
    )
    toks = _tokens(spark, sf_dir).select("doc_id", "tok")
    # doc_id → prefix bucket 1..n (doc_ids are dense 0-based here; the
    # ntile-free arithmetic keeps it one map-side expression).
    counts = per_doc.groupBy().agg(F.max("doc_id").alias("mx")).select(
        (F.col("mx") + 1).alias("n_docs")
    )
    first_seen = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    # Explicit floor() on BOTH engines: Spark's cast-to-int truncates
    # while DuckDB's CAST rounds to nearest, so the bare `x + 1`
    # double diverges one bucket either way — floor pins them.
    new_per_bucket = (
        first_seen.crossJoin(F.broadcast(counts))
        .select(
            F.least(
                F.lit(n),
                (F.floor(F.col("first_doc") * n / F.col("n_docs")) + 1).cast("int"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    toks_per_bucket = (
        per_doc.crossJoin(F.broadcast(counts))
        .select(
            F.least(
                F.lit(n),
                (F.floor(F.col("doc_id") * n / F.col("n_docs")) + 1).cast("int"),
            ).alias("bucket"),
            "n_tok",
        )
        .groupBy("bucket")
        .agg(F.sum("n_tok").alias("bucket_tokens"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    # Drive from toks_per_bucket (every non-empty bucket has tokens) so
    # a bucket where no NEW type first appears still contributes its
    # token count to the running corpus_tokens sum.
    return (
        toks_per_bucket.join(new_per_bucket, "bucket", "left")
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.sum("bucket_tokens").over(w).alias("corpus_tokens"),
            F.sum(F.coalesce(F.col("new_types"), F.lit(0))).over(w).alias(
                "vocab_size"
            ),
        )
    )


ORACLE_TEXT_VOCAB_GROWTH = f"""
WITH {_SQL_TOKENS},
n AS (SELECT max(doc_id) + 1 AS n_docs FROM toks),
first_seen AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok),
new_per_bucket AS (
  SELECT least({_VOCAB_CURVE_POINTS},
               CAST(floor(first_doc * {_VOCAB_CURVE_POINTS} / n.n_docs) AS INTEGER) + 1) AS bucket,
         CAST(count(*) AS BIGINT) AS new_types
  FROM first_seen, n GROUP BY 1),
toks_per_bucket AS (
  SELECT least({_VOCAB_CURVE_POINTS},
               CAST(floor(doc_id * {_VOCAB_CURVE_POINTS} / n.n_docs) AS INTEGER) + 1) AS bucket,
         CAST(count(*) AS BIGINT) AS bucket_tokens
  FROM toks, n GROUP BY 1)
SELECT CAST(t.bucket AS INTEGER) AS bucket,
       CAST(sum(t.bucket_tokens) OVER (ORDER BY t.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS corpus_tokens,
       CAST(sum(coalesce(b.new_types, 0)) OVER (ORDER BY t.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM toks_per_bucket t LEFT JOIN new_per_bucket b USING (bucket)
"""


QUERIES["text_vocab_growth"] = text_vocab_growth
ORACLE["text_vocab_growth"] = ORACLE_TEXT_VOCAB_GROWTH


# ---------------------------------------------------------------------------
# Quality-distribution drift across sources (PSI)
# ---------------------------------------------------------------------------

#: Numerical guard for empty PSI bins (identical literal both engines).
_PSI_EPS = 1e-6


def text_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the lexical-diversity score per
    source vs the whole corpus — the drift monitor a production
    pipeline runs on every new crawl batch; PSI > 0.2 conventionally
    flags a source whose quality profile shifted.

    Scale shape: the per-document score (distinct-token ratio) is one
    map-side array expression (no explode, no shuffle); the corpus
    then collapses to a (source × 10 bins) hash agg — everything after
    is arithmetic on that bounded cell frame: per-source totals, the
    zero-filled bin grid via a ``sequence`` explode (no cross join),
    and global bin shares from a 10-row window. One corpus scan, one
    shuffle.

    Integer-sum contract (round-15 migration of the fractional-sum
    latent class): each bin's (p−q)·ln((p+ε)/(q+ε)) term quantizes to
    a 1e-6-unit LONG before the per-source sum, so the reduce is an
    exact integer fold and partition-order free in both engines.
    Domain bound: |p−q| ≤ 1 and |ln ratio| ≤ ln(1/ε) ≈ 13.9, so each
    term is ≤ ~1.4e7 units and a source's 10-bin sum ≤ ~1.4e8 — eight
    orders inside int64.  Residual cross-engine sensitivity: ±1 unit
    in 1e-6 per term if the two libms' ln() disagree at a floor
    boundary (absorbed unless the final 6-dp rounding also straddles
    one)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    ratio = F.size(F.array_distinct(toks)) / F.size(toks)
    bin_ = F.least(F.lit(9), F.floor(ratio * 10).cast("int")).alias("bin")
    cells = (
        docs.select(F.col("source"), bin_)
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n_sb"))
        # Optimization r18 (guide §5): the bounded cell frame feeds
        # three consumers (per-source totals, global bin shares, the
        # zero-filled grid join) — checkpoint so the corpus scan +
        # per-row ratio runs once.
        .localCheckpoint(eager=False)
    )
    stot = cells.groupBy("source").agg(F.sum("n_sb").alias("n_s"))
    grid = stot.select(
        "source", "n_s", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin")
    )
    filled = grid.join(cells, ["source", "bin"], "left").select(
        "source", "n_s", "bin", F.coalesce(F.col("n_sb"), F.lit(0)).alias("n_sb")
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    btot = (
        cells.groupBy("bin")
        .agg(F.sum("n_sb").alias("n_b"))
        .select("bin", (F.col("n_b") / F.sum("n_b").over(wall)).alias("q"))
    )
    p = F.col("n_sb") / F.col("n_s")
    term6 = quant6(
        (p - F.col("q")) * F.log((p + _PSI_EPS) / (F.col("q") + _PSI_EPS))
    )
    return (
        filled.join(F.broadcast(btot), "bin")
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_docs"),
            pround(F.sum(term6) / 1000000.0, 6).alias("psi"),
        )
    )


ORACLE_TEXT_QUALITY_PSI = f"""
WITH f AS (
  SELECT source,
         least(9, CAST(floor(
           len(list_distinct(string_split(lower(text), ' '))) * 1.0
           / len(string_split(lower(text), ' ')) * 10) AS INTEGER)) AS bin
  FROM documents),
cells AS (SELECT source, bin, count(*) AS n_sb FROM f GROUP BY 1, 2),
stot AS (SELECT source, sum(n_sb) AS n_s FROM cells GROUP BY source),
grid AS (
  SELECT s.source, s.n_s, b.bin
  FROM stot s CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) b),
filled AS (
  SELECT g.source, g.n_s, g.bin, coalesce(c.n_sb, 0) AS n_sb
  FROM grid g LEFT JOIN cells c ON g.source = c.source AND g.bin = c.bin),
btot AS (
  SELECT bin, n_b * 1.0 / sum(n_b) OVER () AS q
  FROM (SELECT bin, sum(n_sb) AS n_b FROM cells GROUP BY bin))
SELECT fl.source, CAST(max(fl.n_s) AS BIGINT) AS n_docs,
       floor(CAST(sum({sql_quant6(
         "(fl.n_sb * 1.0 / fl.n_s - b.q)"
         " * ln((fl.n_sb * 1.0 / fl.n_s + " + str(_PSI_EPS) + ")"
         " / (b.q + " + str(_PSI_EPS) + "))"
       )}) AS DOUBLE) / 1000000.0 * 1000000 + 0.5) / 1000000.0 AS psi
FROM filled fl JOIN btot b USING (bin)
GROUP BY fl.source
"""


QUERIES["text_quality_psi"] = text_quality_psi
ORACLE["text_quality_psi"] = ORACLE_TEXT_QUALITY_PSI


# ---------------------------------------------------------------------------
# Character-entropy quality filter
# ---------------------------------------------------------------------------

#: Docs whose character-level Shannon entropy (bits) falls below this
#: are flagged — the classic gibberish/boilerplate screen (encoded
#: blobs and repeated-character spam sit far below natural text's
#: ~4.1-4.3 bits/char; the threshold splits the synthetic corpus too).
_ENTROPY_MIN_BITS = 4.0


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) and a
    low-entropy verdict — the C4/Gopher-family screen for encoded
    blobs, repeated-character spam, and template boilerplate, which
    token-level heuristics miss.

    One identity: ``H = log2(T) - (Σ c·log2 c)/T`` over per-character
    counts ``c`` (total ``T``), so the whole computation is two hash
    aggregations — explode to (doc_id, char), count, then one per-doc
    fold. Both aggregations partial-aggregate map-side, so the only
    shuffle rows are the ≤ ~100 distinct (doc, char) pairs per
    document, NOT the exploded character stream — the shape that
    survives a 100 TB corpus. The verdict thresholds the 6-dp ROUNDED
    entropy so both engines classify identically at the boundary.
    """
    chars = scan_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars_counted"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.sum(F.col("c") * F.log2("c")).alias("s"),
    )
    entropy = pround(
        F.log2("n_chars_counted") - F.col("s") / F.col("n_chars_counted"), 6
    )
    return per_doc.select(
        "doc_id",
        "n_chars_counted",
        "n_distinct_chars",
        entropy.alias("entropy_bits"),
        F.when(entropy < _ENTROPY_MIN_BITS, F.lit("low_entropy"))
        .otherwise(F.lit("ok"))
        .alias("verdict"),
    )


ORACLE_TEXT_CHAR_ENTROPY = f"""
WITH chars AS (
  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents
),
counts AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_chars_counted,
         CAST(count(*) AS BIGINT) AS n_distinct_chars,
         sum(c * log2(c)) AS s
  FROM counts GROUP BY doc_id),
scored AS (
  SELECT doc_id, n_chars_counted, n_distinct_chars,
         floor((log2(n_chars_counted) - s / n_chars_counted) * 1000000 + 0.5)
           / 1000000.0 AS entropy_bits
  FROM per_doc)
SELECT doc_id, n_chars_counted, n_distinct_chars, entropy_bits,
       CASE WHEN entropy_bits < {_ENTROPY_MIN_BITS} THEN 'low_entropy'
            ELSE 'ok' END AS verdict
FROM scored
"""


QUERIES["text_char_entropy"] = text_char_entropy
ORACLE["text_char_entropy"] = ORACLE_TEXT_CHAR_ENTROPY


# ---------------------------------------------------------------------------
# Zipf fit — word-frequency power-law slope per source
# ---------------------------------------------------------------------------

#: Number of top-frequency terms the log-log regression fits.
_ZIPF_TOP = 50


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf fit: least-squares slope of ln(freq) vs
    ln(rank) over the top-``_ZIPF_TOP`` terms — natural language sits
    near slope −1; a source drifting far off is a synthetic/boilerplate
    red flag, which makes this a cheap corpus-health monitor.

    Shape: one token explode + one (source, tok) hash aggregate (both
    partial-aggregated), a per-source top-N window over the *aggregate*
    (vocab-sized, not corpus-sized), then a 50-point closed-form
    regression over exact integer moments — mergeable one-pass sums,
    no iterative fitter.  Nothing driver-side, nothing quadratic;
    at 100 TB the only full-data pass is the token count itself.

    Arithmetic (round-13 migration of the fractional-avg latent class,
    scheduled in the round-12 record): ln(rank) and ln(freq) quantize
    to 1e-6-unit LONGs, and the closed-form fit runs entirely on the
    four integer moments (Σx, Σy, Σxy, Σx²) — slope is
    (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), with the 1e-6 units cancelling.
    The sums are exact longs (≤ ~2e17 at a 1e13-token corpus, well
    inside int64), so the 4-dp outputs are partition-order
    deterministic; the old ``covar_pop/var_pop/avg`` accumulation was
    float and order-sensitive.  Impl and oracle changed together.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    freq = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("source").orderBy(F.desc("freq"), F.asc("tok"))
    top = (
        freq.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _ZIPF_TOP)
        .select(
            "source",
            quant6(F.log(F.col("rank").cast("double"))).alias("lx6"),
            quant6(F.log(F.col("freq").cast("double"))).alias("ly6"),
        )
    )
    # n_terms > 1 guard: a single-token vocabulary gives a zero
    # denominator, and 0/0 semantics (NaN vs NULL) differ between
    # engines — the fit is undefined there, so both sides pin NULL
    # (ADVICE r5).
    fitted = top.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx6").alias("sx"),
        F.sum("ly6").alias("sy"),
        F.sum(F.col("lx6") * F.col("ly6")).alias("sxy"),
        F.sum(F.col("lx6") * F.col("lx6")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return fitted.select(
        "source",
        F.col("n").alias("n_terms"),
        pround(F.when(F.col("n") > 1, slope), 4).alias("zipf_slope"),
        pround(
            F.when(
                F.col("n") > 1,
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / (F.col("n") * 1000000.0),
            ),
            4,
        ).alias("zipf_intercept"),
    ).orderBy("source")


ORACLE_TEXT_ZIPF_FIT = f"""
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
),
freq AS (
  SELECT source, tok, count(*) AS freq FROM toks GROUP BY source, tok
),
ranked AS (
  SELECT source, freq,
         row_number() OVER (PARTITION BY source ORDER BY freq DESC, tok ASC)
           AS rank
  FROM freq
),
top AS (
  SELECT source,
         CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS lx6,
         CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS ly6
  FROM ranked
  WHERE rank <= {_ZIPF_TOP}
),
fitted AS (
  SELECT source,
         count(*) AS n,
         CAST(sum(lx6) AS BIGINT) AS sx,
         CAST(sum(ly6) AS BIGINT) AS sy,
         CAST(sum(lx6 * ly6) AS BIGINT) AS sxy,
         CAST(sum(lx6 * lx6) AS BIGINT) AS sxx
  FROM top GROUP BY source
)
SELECT source, n AS n_terms,
       floor(CASE WHEN n > 1
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
             END * 10000 + 0.5) / 10000.0 AS zipf_slope,
       floor(CASE WHEN n > 1
                  THEN (CAST(sy AS DOUBLE)
                        - (CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE))
                          * CAST(sx AS DOUBLE))
                       / (n * 1000000.0)
             END * 10000 + 0.5) / 10000.0 AS zipf_intercept
FROM fitted
ORDER BY source
"""


QUERIES["text_zipf_fit"] = text_zipf_fit
ORACLE["text_zipf_fit"] = ORACLE_TEXT_ZIPF_FIT


# ---------------------------------------------------------------------------
# BPE merge-table training
# ---------------------------------------------------------------------------

#: Number of BPE merge rounds to learn.
_BPE_MERGES = 8


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a byte-pair-encoding merge table over the corpus: the
    ``_BPE_MERGES`` highest-weighted adjacent symbol pairs, merged
    greedily one per round — completing the tokenizer story that
    ``text_token_count_bpe`` / ``text_tokenize_ids`` approximate with
    a fixed regex.

    Shape (the Lloyd-loop pattern, cf. ``embedding_kmeans_lloyd``):
    ONE corpus-scale pass builds the word-frequency relation — BPE
    trains on (word, freq), never raw text — which is persisted;
    every subsequent round is a vocabulary-sized pair-count hash
    aggregate plus a 1-row argmax collect (the learned merge is O(1)
    driver state, like a k-means codebook).  No corpus-sized
    broadcast, no quadratic step; at 100 TB only the initial word
    count touches the data.

    Merge application uses the delimited-string representation
    (`` h e l l o ``) with a double ``replace`` of `` l r `` →
    `` lr ``: both engines' ``replace`` scans left-to-right and
    resumes AFTER each replacement, so consecutive pair occurrences
    share a delimiter and alternate passes; the second pass catches
    the skipped ones.  This is deterministic and engine-identical;
    it matches canonical left-to-right BPE everywhere except inside
    runs of ≥5 repeats of one pair, where the merge positions (not
    the merge counts) can differ — an accepted variant, identical in
    Spark and the oracle.  Ties in pair weight break on binary
    (l, r) order in both engines.

    Output is the learned merge table itself (8 rows of parameters),
    materialized driver-side exactly like a trained codebook.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    words = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(
                F.lit(" "), F.regexp_replace(F.col("w"), "(.)", "$1 ")
            ).alias("s"),
            "freq",
        )
        .persist()
    )
    try:
        cur = words
        merges = []
        for rnd in range(1, _BPE_MERGES + 1):
            pc = (
                cur.select("freq", F.split(F.trim(F.col("s")), " ").alias("syms"))
                .where(F.size("syms") >= 2)
                .select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(syms) - 1),"
                            " i -> struct(syms[i-1] AS pl, syms[i] AS pr))"
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.pl").alias("l"), F.col("p.pr").alias("r"))
                .agg(F.sum("freq").alias("cnt"))
            )
            best = pc.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).first()
            if best is None:
                break
            merges.append(
                (rnd, best["l"], best["r"], best["l"] + best["r"], int(best["cnt"]))
            )
            pat = F.lit(f" {best['l']} {best['r']} ")
            rep = F.lit(f" {best['l']}{best['r']} ")
            cur = cur.select(
                F.replace(F.replace(F.col("s"), pat, rep), pat, rep).alias("s"),
                "freq",
            )
        return spark.createDataFrame(
            merges,
            "merge_round int, left_sym string, right_sym string,"
            " merged string, pair_count long",
        )
    finally:
        words.unpersist()


# Unrolled-CTE DuckDB twin of text_bpe_train: one CTE triple (pair
# counts -> 1-row argmax -> merged words) per round.  Built with
# module-level code, NOT a helper function, so appending it does not
# perturb the module-helper staleness hash of unrelated text keys.
_BPE_ORACLE_PARTS = [
    """
WITH words AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
w0 AS (
  SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, freq FROM words
)"""
]
for _r in range(1, _BPE_MERGES + 1):
    _BPE_ORACLE_PARTS.append(
        f""",
p{_r} AS (
  SELECT p['pl'] AS l, p['pr'] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
           i -> {{'pl': syms[i], 'pr': syms[i+1]}})) AS p
    FROM (SELECT string_split(trim(s), ' ') AS syms, freq FROM w{_r - 1})
  )
  GROUP BY 1, 2
),
m{_r} AS (SELECT l, r, cnt FROM p{_r} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
w{_r} AS (
  SELECT replace(replace(w.s, ' ' || m.l || ' ' || m.r || ' ',
                               ' ' || m.l || m.r || ' '),
                 ' ' || m.l || ' ' || m.r || ' ',
                 ' ' || m.l || m.r || ' ') AS s, w.freq
  FROM w{_r - 1} w CROSS JOIN m{_r} m
)"""
    )
_BPE_ORACLE_PARTS.append(
    "\nSELECT * FROM ("
    + "\nUNION ALL ".join(
        f"SELECT {_r} AS merge_round, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, cnt AS pair_count FROM m{_r}"
        for _r in range(1, _BPE_MERGES + 1)
    )
    + ") ORDER BY merge_round"
)
ORACLE_TEXT_BPE_TRAIN = "".join(_BPE_ORACLE_PARTS)


QUERIES["text_bpe_train"] = text_bpe_train
ORACLE["text_bpe_train"] = ORACLE_TEXT_BPE_TRAIN


# ---------------------------------------------------------------------------
# Bigram language-model perplexity
# ---------------------------------------------------------------------------

def text_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source self-perplexity under an add-one-smoothed bigram LM
    trained on the corpus itself — the real LM upgrade of
    ``text_perplexity_proxy``'s character heuristic, and the standard
    quality/outlier signal cheap enough to run on every ingest batch.

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V); each doc scores the mean
    −log2 p over its bigrams; a source reports the mean of its scored
    docs' bits and the corresponding perplexity.

    Shape: token arrays stay map-side (pair extraction via
    ``transform(sequence(...))`` on the split array — no explode-join,
    no positional window shuffle); the corpus model is two hash
    aggregates (bigram, unigram) bounded by the OBSERVED vocabulary,
    not the corpus; scoring joins doc bigrams to the model on the
    bigram key (one shuffle each side).  At 100 TB the model relations
    are the only state and they are vocab-bounded; nothing driver-side.
    Docs with < 2 tokens are unscorable and excluded (both engines).

    Arithmetic (round-12 migration of the fractional-avg latent class
    the mutual-kNN flip proved): each bigram's bits quantizes to a
    1e-6-unit LONG first, the per-doc mean re-quantizes to 1e-6 units
    (one division of exact integers, then floor(·+0.5) — deterministic
    regardless of partition order), and the per-source mean is a long
    sum divided ONCE — no double ever accumulates in partition order.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("w"),
    )
    # Optimization r18 (guide §2.3/§5): the bigram-occurrence stream
    # used to feed BOTH the bigram-count aggregate and the scoring
    # join as separate subtree executions (tokenize + pair transform
    # ran twice), and the scoring join + per-doc rollup shuffled every
    # OCCURRENCE. Pre-aggregate to per-doc bigram multiplicities
    # (doc, source, w1, w2) → k, lazily checkpoint that relation for
    # its two consumers, and weight each bigram's quantized surprisal
    # by its exact integer multiplicity — identical integer sums over
    # far fewer rows (interleaved A/B at sf0.1: ~3.5 s vs ~4.0 s
    # median under a noisy host, and the occurrence shuffle is gone at
    # any scale).
    pc = (
        toks.where(F.size("w") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i-1] AS w1, w[i] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("doc_id", "source", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    bigram = pc.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    unigram = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = unigram.agg(F.countDistinct("tok").cast("double").alias("v"))
    scored = (
        pc.join(bigram, ["w1", "w2"])
        .join(unigram.select(F.col("tok").alias("w1"), "c1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "source",
            "k",
            F.floor(
                -F.log2((F.col("c12") + 1) / (F.col("c1") + F.col("v")))
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("bits6"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.floor(
            F.sum(F.col("k") * F.col("bits6")) / F.sum("k") + F.lit(0.5)
        )
        .cast("long")
        .alias("doc_bits6")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_scored"),
            pround(
                F.sum("doc_bits6") / (F.count(F.lit(1)) * 1000000.0), 4
            ).alias("mean_bits"),
            pround(
                F.pow(
                    F.lit(2.0),
                    F.sum("doc_bits6") / (F.count(F.lit(1)) * 1000000.0),
                ),
                2,
            ).alias("perplexity"),
        )
        .orderBy("source")
    )


ORACLE_TEXT_BIGRAM_LM_PERPLEXITY = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
pairs AS (
  SELECT doc_id, source, p['w1'] AS w1, p['w2'] AS w2
  FROM (
    SELECT doc_id, source,
           unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> {'w1': w[i], 'w2': w[i+1]})) AS p
    FROM toks WHERE len(w) >= 2
  )
),
bigram AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
unigram AS (
  SELECT tok, count(*) AS c1
  FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY 1
),
vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM unigram),
scored AS (
  SELECT p.doc_id, p.source,
         CAST(floor(-log2((b.c12 + 1) / (u.c1 + vocab.v)) * 1000000 + 0.5)
              AS BIGINT) AS bits6
  FROM pairs p
  JOIN bigram b ON p.w1 = b.w1 AND p.w2 = b.w2
  JOIN unigram u ON p.w1 = u.tok
  CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, source,
         CAST(floor(CAST(sum(bits6) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS doc_bits6
  FROM scored GROUP BY 1, 2
)
SELECT source,
       count(*) AS n_docs_scored,
       floor(CAST(sum(doc_bits6) AS DOUBLE) / (count(*) * 1000000.0)
             * 10000 + 0.5) / 10000.0 AS mean_bits,
       floor(pow(2.0, CAST(sum(doc_bits6) AS DOUBLE) / (count(*) * 1000000.0))
             * 100 + 0.5) / 100.0 AS perplexity
FROM per_doc
GROUP BY source
ORDER BY source
"""


QUERIES["text_bigram_lm_perplexity"] = text_bigram_lm_perplexity
ORACLE["text_bigram_lm_perplexity"] = ORACLE_TEXT_BIGRAM_LM_PERPLEXITY


# ---------------------------------------------------------------------------
# PMI collocation mining
# ---------------------------------------------------------------------------

#: Minimum bigram count for a collocation candidate (PMI is unstable
#: on rare pairs) and the number of top collocations emitted.
_PMI_MIN_COUNT = 25
_PMI_TOP = 20


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations (adjacent word pairs) by pointwise mutual
    information — the phrase-mining pass that feeds tokenizer vocab
    candidates and stop-phrase lists:
    PMI(w1,w2) = log2( p(w1,w2) / (p(w1)·p(w2)) ), counted over
    adjacent pairs, thresholded at ``_PMI_MIN_COUNT`` occurrences.

    Shape (the bigram-LM discipline): pair extraction stays map-side
    (``transform(sequence(...))`` on the split array — no explode-join,
    no positional window); the model is two vocab-bounded hash
    aggregates plus two 1-row totals that broadcast; the final ranking
    is a TakeOrdered top-k, never a global sort.  At 100 TB everything
    scales with observed vocabulary, not corpus size.
    """
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("w")
    )
    pairs = (
        toks.where(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i-1] AS w1, w[i] AS w2))"
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # Optimization r18 note: lazy localCheckpoints on the two model
    # relations were measured across two normalized warm sweeps and
    # REVERTED — the materialization barrier serialized branch
    # subtrees that previously executed in parallel, costing ~0.4 s at
    # sf0.1 (the pipeline_fk_integrity_audit lesson: when the
    # re-executed subtree is cheap, parallel duplicate execution beats
    # a checkpoint barrier).
    bigram = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    unigram = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    n_pairs = bigram.agg(F.sum("c12").cast("double").alias("np"))
    n_toks = unigram.agg(F.sum("c1").cast("double").alias("nt"))
    return (
        bigram.where(F.col("c12") >= _PMI_MIN_COUNT)
        .join(unigram.select(F.col("tok").alias("w1"), F.col("c1").alias("ca")), "w1")
        .join(unigram.select(F.col("tok").alias("w2"), F.col("c1").alias("cb")), "w2")
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_toks))
        .select(
            "w1",
            "w2",
            "c12",
            pround(
                F.log2(
                    (F.col("c12") / F.col("np"))
                    / ((F.col("ca") / F.col("nt")) * (F.col("cb") / F.col("nt")))
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(_PMI_TOP)
    )


ORACLE_TEXT_PMI_COLLOCATIONS = f"""
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
  FROM documents
),
pairs AS (
  SELECT p['w1'] AS w1, p['w2'] AS w2
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                  i -> {{'w1': w[i], 'w2': w[i+1]}})) AS p
    FROM toks WHERE len(w) >= 2
  )
),
bigram AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
unigram AS (
  SELECT tok, count(*) AS c1
  FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY 1
),
np AS (SELECT CAST(sum(c12) AS DOUBLE) AS np FROM bigram),
nt AS (SELECT CAST(sum(c1) AS DOUBLE) AS nt FROM unigram)
SELECT b.w1, b.w2, b.c12,
       floor(log2((b.c12 / np.np) / ((ua.c1 / nt.nt) * (ub.c1 / nt.nt)))
             * 10000 + 0.5) / 10000.0 AS pmi
FROM bigram b
JOIN unigram ua ON b.w1 = ua.tok
JOIN unigram ub ON b.w2 = ub.tok
CROSS JOIN np CROSS JOIN nt
WHERE b.c12 >= {_PMI_MIN_COUNT}
ORDER BY pmi DESC, b.w1 ASC, b.w2 ASC
LIMIT {_PMI_TOP}
"""

QUERIES["text_pmi_collocations"] = text_pmi_collocations
ORACLE["text_pmi_collocations"] = ORACLE_TEXT_PMI_COLLOCATIONS


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets
# ---------------------------------------------------------------------------

#: Tertile fractions for the head/middle/tail split.
_CCNET_P1 = 1.0 / 3
_CCNET_P2 = 2.0 / 3


def text_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's signature curation move: score every document with a
    corpus-trained LM, split each language at its own perplexity
    tertiles into head / middle / tail, and report the bucket profile
    (training sets keep head+middle; tail is the noise).

    The scorer is the unigram mean-surprisal of
    :func:`text_perplexity_proxy` (one vocab agg + broadcast over the
    token stream); per-language tertile thresholds are ONE exact
    interpolated percentile aggregate over the doc-level relation
    (language-count rows, broadcast back); bucketing compares 6-dp
    ROUNDED scores to 6-dp rounded thresholds, so no float boundary
    can land differently across engines.  Everything scales with
    vocabulary and document count, never corpus text size.

    Arithmetic (round-12 migration of the fractional-avg latent
    class): each token's surprisal quantizes to a 1e-6-unit LONG
    first, the per-doc mean re-quantizes via one exact-integer
    division + floor(·+0.5) (partition-order free), and the per-bucket
    mean is a long sum divided ONCE — no partition-order double sums.
    """
    # Optimization r18 (guide §2.3/§5): the doc-grain scored relation
    # feeds TWO consumers (the tertile-threshold aggregate and the
    # bucketing join), so the old lineage executed the whole
    # tokenize → vocab-broadcast → surprisal rollup TWICE per run.
    # per_doc is doc-grain (tiny next to the token stream) — a lazy
    # localCheckpoint materializes it once and both consumers read
    # blocks. (A (doc, tok, k) pre-aggregate was also measured and
    # rejected: the per-doc rollup already collapses map-side, so the
    # pre-aggregate only added an exchange — 1.77 s vs 1.27 s solo.)
    docs = scan_parallel(spark, sf_dir, "documents", "doc_id")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    per_doc = (
        toks.join(F.broadcast(vocab.crossJoin(tot)), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.floor(
                F.sum(
                    F.floor(
                        -F.log(F.col("c") / F.col("n")) * 1000000 + F.lit(0.5)
                    ).cast("long")
                )
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("bits6")
        )
        .select(
            "doc_id", "lang", "bits6", (F.col("bits6") / 1000000.0).alias("bits")
        )
        .localCheckpoint(eager=False)
    )
    th = per_doc.groupBy("lang").agg(
        pround(F.expr(f"percentile(bits, {_CCNET_P1!r})"), 6).alias("p33"),
        pround(F.expr(f"percentile(bits, {_CCNET_P2!r})"), 6).alias("p66"),
    )
    bucketed = per_doc.join(F.broadcast(th), "lang").select(
        "lang",
        "bits",
        "bits6",
        F.when(F.col("bits") <= F.col("p33"), "head")
        .when(F.col("bits") <= F.col("p66"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            pround(
                F.sum("bits6") / (F.count(F.lit(1)) * 1000000.0), 4
            ).alias("avg_bits"),
            pround(F.min("bits"), 4).alias("min_bits"),
            pround(F.max("bits"), 4).alias("max_bits"),
        )
        .orderBy("lang", "bucket")
    )


ORACLE_TEXT_CCNET_PERPLEXITY_BUCKETS = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c) AS n FROM vocab),
per_doc AS (
  SELECT doc_id, lang, bits6, bits6 / 1000000.0 AS bits
  FROM (
    SELECT t.doc_id, t.lang,
           CAST(floor(
             CAST(sum(CAST(floor(-ln(v.c * 1.0 / tot.n) * 1000000 + 0.5)
                            AS BIGINT)) AS DOUBLE) / count(*) + 0.5)
           AS BIGINT) AS bits6
    FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id, t.lang
  )
),
th AS (
  SELECT lang,
         floor(quantile_cont(bits, {_CCNET_P1!r}) * 1000000 + 0.5) / 1000000.0 AS p33,
         floor(quantile_cont(bits, {_CCNET_P2!r}) * 1000000 + 0.5) / 1000000.0 AS p66
  FROM per_doc GROUP BY lang
),
bucketed AS (
  SELECT d.lang, d.bits, d.bits6,
         CASE WHEN d.bits <= t.p33 THEN 'head'
              WHEN d.bits <= t.p66 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM per_doc d JOIN th t USING (lang)
)
SELECT lang, bucket,
       count(*) AS n_docs,
       floor(CAST(sum(bits6) AS DOUBLE) / (count(*) * 1000000.0)
             * 10000 + 0.5) / 10000.0 AS avg_bits,
       floor(min(bits) * 10000 + 0.5) / 10000.0 AS min_bits,
       floor(max(bits) * 10000 + 0.5) / 10000.0 AS max_bits
FROM bucketed
GROUP BY lang, bucket ORDER BY lang, bucket
"""

QUERIES["text_ccnet_perplexity_buckets"] = text_ccnet_perplexity_buckets
ORACLE["text_ccnet_perplexity_buckets"] = ORACLE_TEXT_CCNET_PERPLEXITY_BUCKETS


# ---------------------------------------------------------------------------
# IDF rarity scoring
# ---------------------------------------------------------------------------

#: Rarity report size.
_RARITY_TOP = 20


def text_idf_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document rarity scoring: each document's mean inverse document
    frequency over its DISTINCT tokens — high scores mark documents
    built from corpus-rare vocabulary (specialist content worth
    upweighting, or garbage worth inspecting).  Complements
    ``text_tfidf_top_term`` (which ranks terms within a doc; this
    ranks docs within the corpus).

    Shape: distinct (doc, token) pairs → per-token document frequency
    as a WINDOW count over the token-clustered pairs (r19, guide
    §2.4: the old groupBy(tok) + hash-join-back duplicated the
    tokenize → distinct lineage into the df branch — 2 Generates in
    the static plan — and shuffled the pairs by tok twice; one
    exchange on tok now serves both the count and the per-row idf),
    idf = ln((N+1)/(df+1)) smoothed, one doc-keyed mean.  The only
    broadcast is the 1-row corpus size.  Ranking is a TakeOrdered
    top-``_RARITY_TOP``, never a global sort.

    Integer-sum migration (r18 reduce-site sweep): the doc-keyed mean
    runs through the shared :func:`int_mean` reduce (per-row idf
    quantized to 1e-6-unit longs, exact sum, one rounded divide) —
    ``rarity`` drives the top-N ORDERING, so a partition-order float
    ulp in the old ``sum(idf)/count`` could flip two near-tied
    documents across the cut line, not just a 6-dp decimal.  The
    per-row ln(·) is the same double on both engines (identical
    inputs, one libm call) exactly as before; only the accumulation
    is migrated.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", "source", F.explode(F.split(F.trim("text"), " ")).alias("tok")
    ).distinct()
    ndocs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    wtok = Window.partitionBy("tok")
    scored = (
        pairs.withColumn("df", F.count(F.lit(1)).over(wtok))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "source",
            F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)).alias("idf"),
        )
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            int_mean(F.col("idf"), 6).alias("rarity"),
        )
    )
    return (
        scored.select(
            "doc_id",
            "source",
            "n_distinct_tokens",
            "rarity",
        )
        .orderBy(F.desc("rarity"), F.asc("doc_id"))
        .limit(_RARITY_TOP)
    )


ORACLE_TEXT_IDF_RARITY = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, source, unnest(string_split(trim(text), ' ')) AS tok
  FROM documents
),
dfr AS (SELECT tok, count(*) AS df FROM pairs GROUP BY 1),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, source,
         count(*) AS n_distinct_tokens,
         {sql_int_mean('ln((n_docs + 1.0) / (df + 1.0))', 6)} AS rarity
  FROM pairs JOIN dfr USING (tok) CROSS JOIN nd
  GROUP BY 1, 2
)
SELECT doc_id, source, n_distinct_tokens, rarity
FROM scored
ORDER BY rarity DESC, doc_id ASC
LIMIT {_RARITY_TOP}
"""

QUERIES["text_idf_rarity"] = text_idf_rarity
ORACLE["text_idf_rarity"] = ORACLE_TEXT_IDF_RARITY
