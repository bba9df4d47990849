"""Text analysis operators (SURVEY.md §2-C Q30; LLM-pipeline core).

Language-ID (marker-word heuristic), quality scoring (length / stopword /
token-shape ratios), token counting (whitespace + BPE-ish estimate), and
document fingerprinting (md5 content hash) — all pure JVM-side column
expressions (no Python in the hot path), each with a DuckDB oracle built
from the same portable primitives.

Substring occurrence counts use the replace-length trick
(``(len(x) - len(replace(x, m, ''))) / len(m)``) which is exact and
identical in both engines — no regex-dialect skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_state_provider_spark.operators.registry import register
from spark_state_provider_spark.tables import load_table

# marker words per language for the n-gram/stopword language heuristic;
# padded with spaces so matches are whole-word.
LANG_MARKERS = {
    "en": [" the ", " a ", " and "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " die ", " und "],
    "fr": [" le ", " la ", " et "],
    "zh": [" 的 ", " 是 ", " 了 "],
}

STOPWORDS = [" the ", " a ", " and ", " of ", " to "]


def _count_sql(col: str, marker: str) -> str:
    """Portable occurrence count of ``marker`` in ``col``."""
    m = marker.replace("'", "''")
    return f"(length({col}) - length(replace({col}, '{m}', ''))) / {len(marker)}"


def _padded(col: str) -> str:
    return f"(' ' || {col} || ' ')"


# ---------------------------------------------------------------------------
# Q30 — token & length statistics per document.
# ---------------------------------------------------------------------------


@register(
    "q30_text_stats",
    oracle="""
    SELECT doc_id,
           source,
           length(text) AS n_chars_measured,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
           CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
               AS chars_per_token
    FROM documents
    """,
)
def q30_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts + a BPE-ish (~4 chars/token) estimate."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "source",
        F.length("text").alias("n_chars_measured"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("est_bpe_tokens"),
        (F.length("text").cast("double") / F.size(toks)).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Q30b — language identification by marker-word scoring.
# ---------------------------------------------------------------------------


def _lang_id_sql() -> str:
    scores = []
    for lang, markers in LANG_MARKERS.items():
        expr = " + ".join(_count_sql("p", m) for m in markers)
        scores.append(f"CAST({expr} AS BIGINT) AS score_{lang}")
    score_cols = ", ".join(scores)
    # deterministic argmax: highest score wins, ties broken alphabetically
    langs = sorted(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
    WITH p AS (SELECT doc_id, lang, (' ' || text || ' ') AS p FROM documents),
    s AS (SELECT doc_id, lang, {score_cols} FROM p)
    SELECT doc_id, lang AS labeled_lang, {case} AS predicted_lang,
           score_en, score_es, score_de, score_fr, score_zh
    FROM s
    """


@register("q30b_lang_id", oracle=_lang_id_sql())
def q30b_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (deterministic argmax, alphabetic ties)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "p", F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    )
    for lang, markers in LANG_MARKERS.items():
        expr = " + ".join(_count_sql("p", m) for m in markers)
        d = d.withColumn(f"score_{lang}", F.expr(f"CAST({expr} AS BIGINT)"))
    langs = sorted(LANG_MARKERS)
    greatest = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == greatest, lang).otherwise(pred)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        *[F.col(f"score_{lang}") for lang in langs],
    )


# ---------------------------------------------------------------------------
# Q30c — corpus token frequency (top tokens).
# ---------------------------------------------------------------------------


@register(
    "q30c_token_freq",
    oracle="""
    SELECT t.tok AS token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    GROUP BY t.tok
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def q30c_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens (explode → count, map-side combined)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q30d — content fingerprint + duplicate grouping by fingerprint.
# ---------------------------------------------------------------------------


@register(
    "q30d_fingerprint",
    oracle="""
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS canonical_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY md5(text)
    """,
)
def q30d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 content fingerprint (the exact-dedup key at corpus scale)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Q30e — quality scoring (length / stopword-ratio / token-shape features).
# ---------------------------------------------------------------------------


def _quality_sql() -> str:
    stop_expr = " + ".join(_count_sql("p", m) for m in STOPWORDS)
    return f"""
    WITH p AS (
        SELECT doc_id, (' ' || text || ' ') AS p,
               length(text) AS n_chars_m,
               len(string_split(text, ' ')) AS n_toks
        FROM documents
    )
    SELECT doc_id,
           CAST({stop_expr} AS BIGINT) AS n_stopwords,
           CAST({stop_expr} AS DOUBLE) / n_toks AS stopword_ratio,
           CAST(n_chars_m AS DOUBLE) / n_toks AS mean_token_len,
           (CASE WHEN n_chars_m BETWEEN 200 AND 400 THEN 1.0 ELSE 0.5 END) *
               (CASE WHEN CAST({stop_expr} AS DOUBLE) / n_toks BETWEEN 0.01 AND 0.5
                     THEN 1.0 ELSE 0.5 END) AS quality_score
    FROM p
    """


@register("q30e_quality", oracle=_quality_sql())
def q30e_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score from portable ratio features."""
    d = (
        load_table(spark, sf_dir, "documents")
        .withColumn("p", F.concat(F.lit(" "), F.col("text"), F.lit(" ")))
        .withColumn("n_chars_m", F.length("text"))
        .withColumn("n_toks", F.size(F.split("text", " ")))
    )
    stop_expr = " + ".join(_count_sql("p", m) for m in STOPWORDS)
    d = d.withColumn("n_stopwords", F.expr(f"CAST({stop_expr} AS BIGINT)"))
    d = d.withColumn(
        "stopword_ratio", F.col("n_stopwords").cast("double") / F.col("n_toks")
    )
    return d.select(
        "doc_id",
        "n_stopwords",
        "stopword_ratio",
        (F.col("n_chars_m").cast("double") / F.col("n_toks")).alias("mean_token_len"),
        (
            F.when(F.col("n_chars_m").between(200, 400), 1.0).otherwise(0.5)
            * F.when(F.col("stopword_ratio").between(0.01, 0.5), 1.0).otherwise(0.5)
        ).alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Q30f — regex tokenization: a BPE-style pre-tokenizer pattern (letter runs,
# digit runs, single punctuation) counted per document. The real token-count
# op of a training pipeline (q30_text_stats' est_bpe_tokens is the cheap
# chars/4 heuristic; this is the regex path).
# ---------------------------------------------------------------------------

# identical regex semantics in Java (Spark) and RE2 (DuckDB): character
# classes, alternation, + — no lookaround, no \w ambiguity
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "q30f_regex_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT)
               AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '{_TOKEN_RE}')))
               AS BIGINT) AS n_distinct_tokens
    FROM documents
    """,
)
def q30f_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts under a BPE-style pre-tokenizer regex —
    whole-stage-codegen'd (regexp_extract_all is JVM-side, no Python)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.expr(f"regexp_extract_all(text, '{_TOKEN_RE}', 0)")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )
