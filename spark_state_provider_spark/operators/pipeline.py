"""Training-data pipeline operators (LLM-pipeline requirement, beyond Q30).

The ops a 100 TB pretraining-data pipeline runs between "raw corpus" and
"tokenizer input", each deterministic and DuckDB-oracle-checked:

* **Sequence packing** (q38) — concatenate documents into fixed token-budget
  packs, the standard pretraining batching step. Deterministic contiguous
  fill within hash buckets: parallel across buckets, one window per bucket.
* **Split assignment** (q39) — stable train/val/test partition by content
  hash: reproducible across runs, engines, and re-shards (never `rand()`).
* **PII scrub** (q40) — regex redaction (emails, long digit runs) with
  match accounting; pure JVM `regexp_replace`, no Python in the hot path.
* **Repetition quality** (q41) — per-document top-token ratio and
  distinct-token ratio; flags degenerate/repetitive docs.
* **Domain mixing** (q42) — per-source weighted downsampling by hash
  threshold: the deterministic form of "sample web at 25%, wiki at 100%".

All are narrow maps or single-shuffle aggregations; the hash-bucket
parallelism in q38 is the piece that keeps packing linear at 100 TB (a
single global cumulative sum would serialize the corpus through one task).

Reference anchor: the state-store's content-addressed keys (md5-style
stable hashing is the same trick as the reference's versioned key prefixes,
`src/main/scala/com/shaboodi/state/redis/package.scala:7`) — here applied
to corpus management rather than state versioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_state_provider_spark.operators.registry import register
from spark_state_provider_spark.tables import load_table

# ---------------------------------------------------------------------------
# q38 — sequence packing: fixed token-budget document packing.
# ---------------------------------------------------------------------------

PACK_BUDGET = 512  # tokens per pack
N_PACK_BUCKETS = 16  # md5 first hex nibble → 16 parallel packing streams


@register(
    "q38_sequence_packing",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS hkey,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, bucket, est_tokens,
               sum(est_tokens) OVER (
                   PARTITION BY bucket ORDER BY hkey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM d
    )
    SELECT bucket,
           CAST(floor((cum - est_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(est_tokens) AS BIGINT) AS pack_tokens
    FROM c
    GROUP BY bucket, CAST(floor((cum - est_tokens) / {PACK_BUDGET}.0) AS BIGINT)
    """,
)
def q38_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~{PACK_BUDGET}-token sequences, {N_PACK_BUCKETS}
    hash buckets wide.

    Contiguous-fill packing: docs are laid out in stable md5 order inside
    their bucket and a doc joins the pack where its start offset falls
    (packs may overflow by at most one straddling doc — standard pretraining
    concat-and-split semantics). One shuffle on `bucket`, one window, one
    combinable groupBy. Buckets are independent, so at 100 TB parallelism
    is N_PACK_BUCKETS × (docs stay distributed); raise the bucket count
    with the corpus — packing quality is unaffected because budget fill is
    per-bucket-local.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.ceil(F.length("text") / 4.0).alias("est_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("est_tokens").over(w))
    return (
        c.withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("est_tokens")) / float(PACK_BUDGET)),
        )
        .groupBy("bucket", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("est_tokens").alias("pack_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q39 — stable train/val/test split by content hash.
# ---------------------------------------------------------------------------

# md5 first hex char: '0'-'b' (12/16 = 75%) train, 'c'-'d' val, 'e'-'f' test.
_SPLIT_CASE = """
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
         ELSE 'test' END
"""


@register(
    "q39_hash_split",
    oracle=f"""
    SELECT {_SPLIT_CASE} AS split,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM documents
    GROUP BY {_SPLIT_CASE}
    """,
)
def q39_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """75/12.5/12.5 train/val/test assignment by md5(doc_id) prefix.

    Hash-based splits are the only form that survives re-sharding and
    incremental ingestion (a doc's split never depends on what else is in
    the batch). Narrow map + one combinable groupBy; hex-prefix comparison
    keeps the rate exact in sixteenths with no float/int-conversion skew
    between engines.
    """
    d = load_table(spark, sf_dir, "documents")
    split = (
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b", "train"
        )
        .when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "d", "val")
        .otherwise("test")
    )
    return (
        d.groupBy(split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text").cast("bigint")).alias("n_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# q40 — PII scrub: regex redaction with match accounting.
# ---------------------------------------------------------------------------

# Patterns restricted to the syntax Java regex and RE2 (DuckDB) share.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
DIGITS_RE = "[0-9]{3,}"


@register(
    "q40_pii_scrub",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ref ' || CAST(doc_id * 7919 AS VARCHAR)
                   AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(raw, '{DIGITS_RE}')) AS INT) AS n_digit_runs,
           regexp_replace(regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{DIGITS_RE}', '<NUM>', 'g') AS scrubbed
    FROM w
    """,
)
def q40_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails and ≥3-digit runs, counting matches per document.

    The corpus is synthetic, so each doc gets one deterministic injected
    email + numeric ref (making redaction observable); the scrub itself is
    the production shape: chained `regexp_replace` — a narrow JVM-side map,
    embarrassingly parallel, no shuffle at any scale. Patterns use only the
    regex subset Java and RE2 share, so both engines see identical matches.
    """
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919).cast("string"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(raw, F.lit(DIGITS_RE)).cast("int").alias("n_digit_runs"),
        F.regexp_replace(
            F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"), DIGITS_RE, "<NUM>"
        ).alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# q41 — repetition / degeneracy quality signals.
# ---------------------------------------------------------------------------

REPETITION_FLAG = 0.10  # top token > 10% of doc → repetitive


@register(
    "q41_repetition_stats",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        )
        WHERE t <> ''
    ),
    tf AS (
        SELECT doc_id, t, count(*) AS cnt
        FROM tok GROUP BY doc_id, t
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           max(cnt) AS top_token_count,
           CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_token_ratio,
           CAST(count(*) AS DOUBLE) / sum(cnt) AS distinct_ratio,
           CAST(max(cnt) AS DOUBLE) / sum(cnt) > {REPETITION_FLAG}
               AS is_repetitive
    FROM tf
    GROUP BY doc_id
    """,
)
def q41_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-repetition profile; flags docs whose single most
    frequent token exceeds {REPETITION_FLAG:.0%} of all tokens.

    Two combinable groupBys keyed by doc_id — after the first shuffle the
    second is co-partitioned (no second exchange). The explode is the only
    row expansion and is map-local. This is the cheap degenerate-text
    filter every pretraining pipeline runs before expensive dedup.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
    )
    tf = tok.groupBy("doc_id", "t").agg(F.count("*").alias("cnt"))
    return tf.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top_token_count"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_token_ratio"),
        (F.count("*").cast("double") / F.sum("cnt")).alias("distinct_ratio"),
        (F.max("cnt").cast("double") / F.sum("cnt") > REPETITION_FLAG).alias(
            "is_repetitive"
        ),
    )


# ---------------------------------------------------------------------------
# q42 — domain mixing: per-source weighted downsample by hash threshold.
# ---------------------------------------------------------------------------

# sources are 'src0'..'src19'; rate cycles 4/16, 8/16, 12/16, 16/16 by the
# numeric suffix — the deterministic analog of per-domain mixture weights.
_RATE_NIBBLES = {0: "3", 1: "7", 2: "b", 3: "f"}  # keep if first nibble <= this


def _rate_threshold_sql(src: str) -> str:
    return (
        f"CASE CAST(substr({src}, 4) AS BIGINT) % 4 "
        + " ".join(f"WHEN {k} THEN '{v}'" for k, v in _RATE_NIBBLES.items())
        + " END"
    )


@register(
    "q42_domain_mix",
    oracle=f"""
    WITH kept AS (
        SELECT source, doc_id, length(text) AS n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|' || source), 1, 1)
              <= {_rate_threshold_sql('source')}
    )
    SELECT source,
           count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars,
           min(doc_id) AS min_doc
    FROM kept
    GROUP BY source
    """,
)
def q42_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted per-source downsample: sources keep 25/50/75/100% of docs
    by md5 threshold, the deterministic form of domain-mixture sampling.

    A narrow filter (no shuffle) followed by one combinable groupBy. Hash
    thresholds in sixteenths make the keep decision identical across
    engines and across re-runs — the property that makes a 100 TB mixture
    reproducible and incrementally extensible (new docs don't perturb old
    decisions, unlike reservoir or rand() sampling).
    """
    d = load_table(spark, sf_dir, "documents")
    threshold = F.expr(_rate_threshold_sql("source"))
    kept = d.where(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("source"))),
            1,
            1,
        )
        <= threshold
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.length("text").cast("bigint")).alias("kept_chars"),
        F.min("doc_id").alias("min_doc"),
    )


# ---------------------------------------------------------------------------
# q46 — benchmark decontamination: n-gram overlap between the training
# corpus and a held-out benchmark set. The standard pretraining hygiene pass
# (report overlapping (train_doc, bench_doc) pairs so the train side can be
# dropped). Benchmark membership here is the deterministic doc_id % 97 == 0
# slice — in production it is MMLU/GSM8K/etc., always tiny vs the corpus.
# ---------------------------------------------------------------------------

CONTAM_MIN_SHARED = 2  # flag pairs sharing ≥ this many distinct shingles


@register(
    "q46_contamination",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    tri AS (
        SELECT DISTINCT doc_id, t.tri
        FROM tok, unnest(list_transform(
            generate_series(1, len(l) - 2),
            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        )) AS t(tri)
    )
    SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
    FROM tri c JOIN tri b USING (tri)
    WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
    GROUP BY c.doc_id, b.doc_id
    HAVING count(*) >= {CONTAM_MIN_SHARED}
    """,
)
def q46_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark contamination report: corpus docs sharing ≥
    {CONTAM_MIN_SHARED} distinct word-shingles with any benchmark doc.

    The benchmark shingle set BROADCASTS (benchmark suites are KBs-to-MBs
    against a 100 TB corpus), so the corpus side is a narrow scan + hash
    probe + map-side-combined count — no corpus shuffle at any scale. The
    grouped count shuffles only matching (doc, bench) pairs, which is
    bounded by benchmark size, not corpus size.
    """
    from spark_state_provider_spark.operators.dedup import _trigrams_persisted

    tri = _trigrams_persisted(spark, sf_dir)
    bench = tri.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "tri"
    )
    corpus = tri.where(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(F.broadcast(bench), "tri")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# q47 — TF-IDF top terms per source: the classic corpus-characterization /
# keyword-extraction pass. IDF is kept as the exact rational tf·N/df
# (IEEE division of exact integers — bit-identical across engines; a libm
# `ln` is NOT guaranteed identical between DuckDB and the JVM, and the
# ranking is invariant to the monotone log for fixed df anyway).
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 5


@register(
    "q47_tfidf_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t.t AS term
        FROM documents, unnest(string_split(text, ' ')) AS t(t)
        WHERE t.t <> ''
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    tf AS (
        SELECT d.source, k.term, count(*) AS tf
        FROM tok k JOIN documents d USING (doc_id)
        GROUP BY d.source, k.term
    ),
    scored AS (
        SELECT tf.source, tf.term, tf.tf, df.df,
               CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
        FROM tf, df, n
        WHERE tf.term = df.term
    )
    SELECT source, term, tf, df, score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY score DESC, term
        ) AS rn
        FROM scored
    )
    WHERE rn <= {TFIDF_TOP_K}
    """,
)
def q47_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_K} TF-IDF terms per source.

    Three aggregations over the token stream (term-frequency per source,
    document-frequency per term, corpus size) joined back; the df side
    BROADCASTS (vocabulary ≪ corpus) and the per-source top-k is a
    WindowGroupLimit (each map task forwards ≤ k rows per source). At
    100 TB: two shuffles on term-sized data, never on raw tokens twice —
    the token explode happens once into a cached frame.
    """
    tok = _tokens_persisted(spark, sf_dir)
    n_docs = tok.select("doc_id").distinct().count()  # one scalar to driver
    df_ = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = tok.groupBy("source", "term").agg(F.count("*").alias("tf"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "source",
        "term",
        "tf",
        "df",
        ((F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TFIDF_TOP_K)
        .drop("rn")
    )


# one persisted token stream per (session, sf_dir) — tok feeds three
# consumers (corpus size, df, tf); same lifecycle pattern as dedup._TRI_CACHE
_TOK_CACHE: dict[tuple[str, str], DataFrame] = {}


def _tokens_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    from spark_state_provider_spark.dfcache import get_or_build

    def build() -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
        return (
            d.repartition(n_parts, "doc_id")
            .select(
                "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
            )
            .where(F.col("term") != "")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    return get_or_build(_TOK_CACHE, spark, (sf_dir,), build)


# ---------------------------------------------------------------------------
# q52 — unigram-LM document scoring: mean corpus-frequency of a document's
# tokens. The vocabulary-based quality signal (rare-token-heavy docs are
# gibberish/OCR noise; very-common-token docs are boilerplate) computed as
# an exact rational (Σ freq)/(n tokens) — no log-probs, so the score is
# engine-portable without float-summation skew.
# ---------------------------------------------------------------------------


@register(
    "q52_unigram_lm",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
    freq AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok2 GROUP BY term)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(n) AS BIGINT) AS sum_freq,
           CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_freq
    FROM tok2 JOIN freq USING (term)
    GROUP BY doc_id
    """,
)
def q52_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram corpus frequency.

    Plan: the token table is built once (shared persisted explode,
    `_tokens_persisted`); the vocabulary aggregate is small (it's a
    vocabulary — bounded, not corpus-sized) so the score join is a
    BROADCAST join back onto tokens followed by one groupBy(doc_id) with
    map-side partial sums. At 100 TB: corpus scan + tiny dim broadcast +
    one shuffle on doc_id — no vocab-sized shuffle of the token stream.
    """
    tok = _tokens_persisted(spark, sf_dir).select("doc_id", "term")
    freq = tok.groupBy("term").agg(F.count("*").alias("n"))
    return (
        tok.join(F.broadcast(freq), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("n").alias("sum_freq"),
            (F.sum("n").cast("double") / F.count("*").cast("double")).alias(
                "mean_freq"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q59 — order-insensitive table fingerprints: the migration-audit op. A
# user switching engines (the repo's whole premise) needs to certify "same
# rows on both sides" without sorting 100 TB: per-row md5 over a canonical
# string → 48-bit prefix → bit_xor aggregate (commutative, overflow-free,
# partial-aggregatable). Only int/string columns feed the canonical form —
# float rendering is engine-specific, exact values are already covered by
# the per-query oracles.
# ---------------------------------------------------------------------------

_FP_TABLES = {
    "documents": ["doc_id", "text", "lang", "source"],
    "orders": ["o_orderkey", "o_custkey", "o_orderpriority"],
    "customer": ["c_custkey", "c_name", "c_nationkey"],
}


# 2^48 — the row-hash domain; the wraparound-sum fingerprint is taken mod
# this so Spark (DECIMAL sum) and DuckDB (HUGEINT sum) agree exactly.
_FP_MOD = 1 << 48


def _fp_oracle() -> str:
    parts = []
    for tbl, cols in _FP_TABLES.items():
        # NULL sentinel chr(1): concat_ws silently skips NULLs, which would
        # canonicalize (a,NULL,b) and (a,b,NULL) identically
        canon = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(1))" for c in cols)
        parts.append(
            f"SELECT '{tbl}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows, "
            f"bit_xor(h) AS fp, "
            f"CAST(sum(h) % {_FP_MOD} AS BIGINT) AS fp_sum "
            f"FROM (SELECT ('0x' || substr(md5(concat_ws('|', {canon})), 1, 12))::BIGINT"
            f" AS h FROM {tbl})"
        )
    return " UNION ALL ".join(parts)


@register("q59_table_fingerprint", oracle=_fp_oracle())
def q59_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (row count + xor AND wraparound-sum of 48-bit
    row hashes) for {len(_FP_TABLES)} tables.

    NULLs are encoded with a chr(1) sentinel before concat_ws (which skips
    NULLs, so (a,NULL,b) and (a,b,NULL) would otherwise collide), and the
    sum fingerprint is multiplicity-sensitive where xor cancels any row
    with even multiplicity — together they close both documented
    false-negative classes of the xor-only form. The sum accumulates as
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) then reduces mod 2^48, so
    both engines agree without int64 wraparound ambiguity.

    Scale shape: narrow hash map + combinable aggregates per table (xor and
    sum both partial-aggregate map-side; the shuffle carries one row per
    partition) — certifying a 100 TB copy costs a single scan per side,
    no sort, no join.
    """
    out = None
    for tbl, cols in _FP_TABLES.items():
        d = load_table(spark, sf_dir, tbl)
        canon = F.concat_ws(
            "|",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols],
        )
        h = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")
        agg = d.select(h.alias("h")).agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").alias("fp"),
            F.expr(
                f"CAST(sum(CAST(h AS DECIMAL(38,0))) % {_FP_MOD} AS BIGINT)"
            ).alias("fp_sum"),
        )
        row = agg.select(F.lit(tbl).alias("tbl"), "n_rows", "fp", "fp_sum")
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q64 — table profiling: per-column null count, distinct count, and
# (for string/int columns) min/max — the ANALYZE-style pass every pipeline
# runs before trusting a new drop of data. One aggregate row computes all
# stats, then unpivots to tidy long form. Float/timestamp min/max are
# deliberately omitted: their string rendering is engine-specific, and
# exact float behavior is covered by the per-query oracles.
# ---------------------------------------------------------------------------

_PROFILE_COLS = {
    # column -> include min/max (string-renderable deterministically)
    "o_orderkey": True,
    "o_custkey": True,
    "o_orderstatus": True,
    "o_orderpriority": True,
    "o_totalprice": False,
    "o_orderdate": False,
}


def _profile_oracle() -> str:
    aggs = []
    for c, mm in _PROFILE_COLS.items():
        aggs.append(f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}_nulls")
        aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS {c}_distinct")
        if mm:
            aggs.append(f"CAST(min({c}) AS VARCHAR) AS {c}_min")
            aggs.append(f"CAST(max({c}) AS VARCHAR) AS {c}_max")
    rows = []
    for c, mm in _PROFILE_COLS.items():
        mn = f"{c}_min" if mm else "NULL"
        mx = f"{c}_max" if mm else "NULL"
        rows.append(
            f"SELECT '{c}' AS col, {c}_nulls AS n_nulls, "
            f"{c}_distinct AS n_distinct, CAST({mn} AS VARCHAR) AS min_str, "
            f"CAST({mx} AS VARCHAR) AS max_str FROM g"
        )
    return f"WITH g AS (SELECT {', '.join(aggs)} FROM orders) " + " UNION ALL ".join(rows)


@register("q64_table_profile", oracle=_profile_oracle())
def q64_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table: nulls, distincts, min/max.

    Scale shape: ONE aggregation pass computes every column's stats
    (count-distincts share the scan; Spark plans them via expand +
    partial aggregation, all map-side combinable), and the tidy unpivot
    operates on a single driver-sized row. Profiling 100 TB costs one
    scan regardless of column count.
    """
    d = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, mm in _PROFILE_COLS.items():
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}_nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}_distinct"))
        if mm:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}_min"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}_max"))
    g = d.agg(*aggs)
    out = None
    for c, mm in _PROFILE_COLS.items():
        row = g.select(
            F.lit(c).alias("col"),
            F.col(f"{c}_nulls").alias("n_nulls"),
            F.col(f"{c}_distinct").alias("n_distinct"),
            (F.col(f"{c}_min") if mm else F.lit(None)).cast("string").alias("min_str"),
            (F.col(f"{c}_max") if mm else F.lit(None)).cast("string").alias("max_str"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# q77 — document chunking with overlap: split long documents into
# fixed-token sliding windows (the context-window preparation step between
# cleaning and tokenization — RAG indexing and long-doc pretraining both
# consume exactly this shape). A window is emitted when it starts the
# document or adds at least one token beyond the previous window's end, so
# short tails are never emitted twice.
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24  # overlap = _CHUNK_TOKENS - _CHUNK_STRIDE = 8 tokens


@register(
    "q77_doc_chunking",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    SELECT doc_id,
           CAST((s.start - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           array_to_string(l[s.start : s.start + {_CHUNK_TOKENS} - 1], ' ')
               AS chunk_text,
           CAST(least({_CHUNK_TOKENS}, len(l) - s.start + 1) AS INTEGER)
               AS n_tokens
    FROM tok, unnest(generate_series(1, len(l), {_CHUNK_STRIDE})) AS s(start)
    WHERE s.start = 1
       OR s.start - {_CHUNK_STRIDE} + {_CHUNK_TOKENS} - 1 < len(l)
    """,
)
def q77_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks (32 tokens, stride 24) per
    document.

    Scale shape: tokenize → sequence → explode → slice is a narrow
    row-expanding map (no shuffle at all); the fan-out factor is bounded
    by ceil(n_tokens/stride) per document. Every function is a JVM
    codegen builtin — no Python in the path. The tail rule (emit a
    window only if it extends past the previous window's end) matches the
    oracle's WHERE clause token-for-token, so chunk boundaries are
    engine-exact.
    """
    d = load_table(spark, sf_dir, "documents")
    # NULL-text docs emit no chunks: the oracle's generate_series over a
    # NULL length yields no rows, but Spark's greatest(size(NULL), 1)
    # ignores the NULL and would manufacture one phantom NULL chunk —
    # divergence found by the round-8 multibyte/NULL fuzz family
    toks = d.where(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("l")
    )
    exploded = toks.select(
        "doc_id",
        "l",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("l"), F.lit(1)),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("start"),
    ).where(
        (F.col("start") == 1)
        | (
            F.col("start") - _CHUNK_STRIDE + _CHUNK_TOKENS - 1
            < F.size("l")
        )
    )
    return exploded.select(
        "doc_id",
        F.expr(f"CAST((start - 1) DIV {_CHUNK_STRIDE} AS BIGINT)").alias(
            "chunk_idx"
        ),
        F.array_join(
            F.expr(f"slice(l, start, {_CHUNK_TOKENS})"), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(_CHUNK_TOKENS), F.size("l") - F.col("start") + 1
        ).cast("int").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# q83 — deterministic global shuffle: the training-order step. Before
# writing shards, a pretraining pipeline re-orders the corpus by a
# deterministic pseudo-random key (seeded hash) so every epoch and every
# re-run sees the same "random" order. The hard part at scale is the
# GLOBAL position: a naive row_number() over a total order is a
# single-partition window (the classic WindowExec collapse). This uses
# the two-phase pattern instead: hash-prefix range buckets → per-bucket
# counts → broadcast prefix-sum offsets → per-bucket (parallel) rank +
# offset. Same result, no all-to-one stage.
# ---------------------------------------------------------------------------

_SHUF_SEED = "ep1"  # epoch seed: different seed → different stable order


@register(
    "q83_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           md5('{_SHUF_SEED}' || '|' || CAST(doc_id AS VARCHAR)) AS k,
           CAST(row_number() OVER (
               ORDER BY md5('{_SHUF_SEED}' || '|' || CAST(doc_id AS VARCHAR)),
                        doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def q83_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a global position in a seeded pseudo-random
    total order (md5 of seed|doc_id), without a single-partition window.

    Two phases: (1) the first two hex chars of the key define 256 range
    buckets whose order refines to the full key order; per-bucket counts
    prefix-sum into start offsets (256-row aggregate, broadcast back).
    (2) ranks are computed per bucket — parallel windows over ~n/256 rows
    — and shifted by the bucket offset. At 100 TB this is exactly how
    you'd shard an epoch: the bucket is the shard file, the offset its
    base index. Both phases shuffle on keys the rows already carry; the
    only serial object is the 256-entry offset table.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat_ws("|", F.lit(_SHUF_SEED), F.col("doc_id").cast("string"))
        ).alias("k"),
    )
    d = d.withColumn("bucket", F.substring("k", 1, 2))
    counts = d.groupBy("bucket").agg(F.count("*").alias("n"))
    # 256-row frame: the running offset window is trivially cheap and the
    # result broadcasts — the global order's only sequential artifact
    woff = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("off")
    )
    wb = Window.partitionBy("bucket").orderBy("k", "doc_id")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn("shuffle_pos", F.row_number().over(wb) + F.col("off"))
        .select("doc_id", "k", F.col("shuffle_pos").cast("long").alias("shuffle_pos"))
    )


# ---------------------------------------------------------------------------
# q84 — vocabulary induction with a coverage cutoff: rank corpus tokens by
# frequency and keep the head that covers ≥ the target share of all token
# occurrences (the word-level analog of choosing a tokenizer vocab size).
# ---------------------------------------------------------------------------

_VOCAB_COVERAGE = 0.95


@register(
    "q84_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT t.tok FROM documents,
             unnest(string_split(text, ' ')) AS t(tok)
    ),
    freq AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
    tot AS (SELECT sum(n) AS total FROM freq),
    ranked AS (
        SELECT tok, n,
               CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT)
                   AS rank,
               CAST(sum(n) OVER (ORDER BY n DESC, tok
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total AS cum_share
        FROM freq, tot
    )
    SELECT tok, n, rank, cum_share FROM ranked
    WHERE rank = 1 OR (cum_share - CAST(n AS DOUBLE) / (SELECT total FROM tot))
                      < {_VOCAB_COVERAGE}
    """,
)
def q84_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary truncated at {_VOCAB_COVERAGE:.0%}
    occurrence coverage: every token whose PRECEDING head covers less than
    the target (so the crossing token is included).

    Scale shape: token counting is explode + one map-side-combined hash
    agg (the only corpus-scale work); everything after operates on the
    VOCABULARY — orders of magnitude smaller than the corpus (Heaps' law)
    — so the ranking window's single-partition stage sorts vocab rows,
    not corpus rows. The total-occurrence count rides along as a
    broadcast one-row frame, the same corpus-stats pattern as BM25.
    """
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    wr = Window.orderBy(F.col("n").desc(), "tok")
    ranked = (
        freq.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .withColumn(
            "cum_share",
            F.sum("n").over(wr.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double") / F.col("total"),
        )
    )
    return ranked.where(
        (F.col("rank") == 1)
        | (
            F.col("cum_share") - F.col("n").cast("double") / F.col("total")
            < _VOCAB_COVERAGE
        )
    ).select("tok", "n", "rank", "cum_share")


# ---------------------------------------------------------------------------
# q90 — the composed end-to-end training-corpus pipeline: quality gate →
# exact dedup → benchmark decontamination → split/pack accounting, as ONE
# lazy plan. Each stage exists standalone elsewhere (q30e quality, q28
# dedup, q46 contamination, q39 split, q38 packing); this operator proves
# they compose — the DuckDB oracle replays the identical CTE chain, so the
# whole pipeline (not just each stage) is hash-verified.
# ---------------------------------------------------------------------------

_PIPE_MIN_CHARS = 100  # quality gate: minimum document length
_PIPE_MIN_TOKS = 10  # quality gate: minimum whitespace tokens


# shared by q90 (one-shot lazy plan) and q103 (its streaming twin,
# streaming_queries.py): keep-first-seen dedup over a doc_id-ordered
# replay equals keep-min-doc_id, and every other stage is per-doc, so the
# streamed accounting equals the one-shot computation.
_PIPE_ORACLE = f"""
    WITH q AS (
        SELECT doc_id, text, source,
               {_SPLIT_CASE} AS split,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        FROM documents
        WHERE length(text) >= {_PIPE_MIN_CHARS}
          AND len(string_split(text, ' ')) >= {_PIPE_MIN_TOKS}
          AND doc_id % 97 <> 0
    ),
    s AS (
        SELECT * FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY text) AS rep FROM q
        ) WHERE doc_id = rep
    ),
    tok AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM documents
        WHERE len(string_split(text, ' ')) >= 3
    ),
    tri AS (
        SELECT DISTINCT doc_id, t.tri
        FROM tok, unnest(list_transform(
            generate_series(1, len(l) - 2),
            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        )) AS t(tri)
    ),
    contam AS (
        SELECT DISTINCT doc_id FROM (
            SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS ns
            FROM tri c JOIN tri b USING (tri)
            WHERE b.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
            GROUP BY c.doc_id, b.doc_id
            HAVING count(*) >= {CONTAM_MIN_SHARED}
        )
    ),
    clean AS (
        SELECT * FROM s WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    )
    SELECT source, split,
           count(*) AS n_docs,
           CAST(sum(est_tokens) AS BIGINT) AS n_tokens,
           CAST(ceil(sum(est_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS n_packs
    FROM clean
    GROUP BY source, split
    """


@register("q90_corpus_pipeline", oracle=_PIPE_ORACLE)
def q90_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build: quality gate → exact dedup (min-doc_id
    representative) → benchmark decontamination (≥{CONTAM_MIN_SHARED}
    shared word-trigrams with the doc_id%97 benchmark slice) → per
    (source, split) doc/token/pack accounting.

    Scale shape of the composed plan (all lazy, Catalyst fuses the stages):
    the quality gate is a narrow filter ON THE SCAN (no extra pass); exact
    dedup is the plan's one fact-sized shuffle, keyed by text (at 100 TB
    key by md5(text) — same semantics, 16-byte shuffle key instead of the
    document body; raw text is kept here so the DuckDB oracle is literal);
    the contamination probe broadcasts only benchmark trigrams (benchmark
    suites are MBs against a 100 TB corpus), so the corpus side is a
    map-side hash probe; the contaminated-id set (bounded by benchmark
    overlap, not corpus size) broadcasts back as an anti join; the final
    rollup is a combinable agg on (source, split) — a few hundred groups.
    Stage order matters and is chosen cheapest-first: the quality filter
    prunes before the dedup shuffle, and only deduped survivors are probed
    for contamination.
    """
    from spark_state_provider_spark.operators.dedup import _trigrams_persisted

    d = load_table(spark, sf_dir, "documents")
    split = (
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "b",
            "train",
        )
        .when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "d", "val")
        .otherwise("test")
    )
    q = d.where(
        (F.length("text") >= _PIPE_MIN_CHARS)
        & (F.size(F.split("text", " ")) >= _PIPE_MIN_TOKS)
        & (F.col("doc_id") % 97 != 0)
    ).select(
        "doc_id",
        "text",
        "source",
        split.alias("split"),
        F.ceil(F.length("text") / 4.0).alias("est_tokens"),
    )
    s = (
        q.withColumn("rep", F.min("doc_id").over(Window.partitionBy("text")))
        .where(F.col("doc_id") == F.col("rep"))
        .drop("rep", "text")
    )
    tri = _trigrams_persisted(spark, sf_dir)
    bench = tri.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "tri"
    )
    contam = (
        tri.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "tri")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("ns"))
        .where(F.col("ns") >= CONTAM_MIN_SHARED)
        .select("doc_id")
        .distinct()
    )
    clean = s.join(F.broadcast(contam), "doc_id", "left_anti")
    return clean.groupBy("source", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("est_tokens").alias("n_tokens"),
        F.ceil(F.sum("est_tokens") / float(PACK_BUDGET)).alias("n_packs"),
    )


# ---------------------------------------------------------------------------
# q95 — single-pass data-quality audit (the Deequ-style constraint suite):
# the gate every pipeline runs before trusting a new drop of data.
# Scan-expressible constraints (completeness, uniqueness, accepted values,
# value ranges) compile to conditional-count aggregates — ONE combinable
# aggregate row per table, no matter how many constraints — and the one
# relational constraint (FK referential integrity) is a broadcast-able
# anti-join count. Output is a tidy (constraint, violations, n_checked,
# passed) verdict table. One accepted-values constraint is deliberately
# narrower than the data (o_orderpriority ∈ top-3 priorities) so the
# failing branch of the verdict is exercised deterministically, not just
# the all-green path.
# ---------------------------------------------------------------------------

_DQ_STATUS = ("O", "F", "P")
_DQ_PRIORITY = ("1-URGENT", "2-HIGH", "3-MEDIUM")  # deliberately incomplete


@register(
    "q95_data_quality_audit",
    oracle=f"""
    WITH o AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_cust,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
               CAST(sum(CASE WHEN o_orderstatus NOT IN {_DQ_STATUS} THEN 1
                             ELSE 0 END) AS BIGINT) AS bad_status,
               CAST(sum(CASE WHEN o_orderpriority NOT IN {_DQ_PRIORITY} THEN 1
                             ELSE 0 END) AS BIGINT) AS bad_priority,
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nonpos_price
        FROM orders
    ), l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1
                             ELSE 0 END) AS BIGINT) AS bad_qty
        FROM lineitem
    ), fk AS (
        SELECT CAST(count(*) AS BIGINT) AS orphans,
               (SELECT n FROM o) AS n
        FROM orders
        -- explicit: orphan = NON-NULL key without a parent (NULL keys are
        -- the 'complete' constraint's business; NOT IN alone would drop
        -- them only implicitly via UNKNOWN)
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer
                          WHERE c_custkey = o_custkey)
    )
    SELECT 'orders.o_custkey.complete' AS constraint, null_cust AS violations,
           n AS n_checked, null_cust = 0 AS passed FROM o
    UNION ALL
    SELECT 'orders.o_orderkey.unique', dup_keys, n, dup_keys = 0 FROM o
    UNION ALL
    SELECT 'orders.o_orderstatus.accepted', bad_status, n, bad_status = 0 FROM o
    UNION ALL
    SELECT 'orders.o_orderpriority.accepted', bad_priority, n,
           bad_priority = 0 FROM o
    UNION ALL
    SELECT 'orders.o_totalprice.positive', nonpos_price, n,
           nonpos_price = 0 FROM o
    UNION ALL
    SELECT 'lineitem.l_quantity.range', bad_qty, n, bad_qty = 0 FROM l
    UNION ALL
    SELECT 'orders.o_custkey.fk_customer', orphans, n, orphans = 0 FROM fk
    """,
)
def q95_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite verdicts over orders/lineitem (+ the orders →
    customer FK), one tidy row per constraint.

    Scale shape: all six scan constraints ride TWO aggregate rows (one
    combinable single-pass agg per table — adding a constraint adds a
    column, not a scan); the FK check is a broadcast anti-join count of
    the key column only. Everything stays one lazy plan — no eager
    counts, no driver-side loop over constraints.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    o_agg = o.agg(
        F.count("*").alias("n"),
        cnt(F.col("o_custkey").isNull()).alias("null_cust"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        cnt(~F.col("o_orderstatus").isin(*_DQ_STATUS)).alias("bad_status"),
        cnt(~F.col("o_orderpriority").isin(*_DQ_PRIORITY)).alias(
            "bad_priority"
        ),
        cnt(F.col("o_totalprice") <= 0).alias("nonpos_price"),
    )
    l_agg = li.agg(
        F.count("*").alias("n"),
        cnt(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("bad_qty"),
    )
    # FK-orphan = NON-NULL key with no parent: NULL keys belong to the
    # 'complete' constraint above, not here (and an unfiltered left_anti
    # would count them as orphans while the oracle's NOT IN drops them —
    # divergence found by the round-7 NULL-key join fuzz family).
    orphans = (
        o.select("o_custkey")
        .where(F.col("o_custkey").isNotNull())
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphans"))
    )

    def verdict(src, name, metric):
        return src.select(
            F.lit(name).alias("constraint"),
            F.col(metric).alias("violations"),
            F.col("n").alias("n_checked"),
            (F.col(metric) == 0).alias("passed"),
        )

    fk = orphans.join(o_agg.select("n"))  # 1×1 row join — verdict context
    return (
        verdict(o_agg, "orders.o_custkey.complete", "null_cust")
        .unionAll(verdict(o_agg, "orders.o_orderkey.unique", "dup_keys"))
        .unionAll(
            verdict(o_agg, "orders.o_orderstatus.accepted", "bad_status")
        )
        .unionAll(
            verdict(o_agg, "orders.o_orderpriority.accepted", "bad_priority")
        )
        .unionAll(
            verdict(o_agg, "orders.o_totalprice.positive", "nonpos_price")
        )
        .unionAll(verdict(l_agg, "lineitem.l_quantity.range", "bad_qty"))
        .unionAll(verdict(fk, "orders.o_custkey.fk_customer", "orphans"))
    )


# ---------------------------------------------------------------------------
# q101 — deterministic negative sampling: the pair-generation op behind
# contrastive / embedding training ("for every anchor document, pick K
# random other documents"). A naive implementation samples via a join
# against a shuffled copy or, worse, a cross join; the scale answer is
# CLOSED-FORM: negative j of anchor d is hash(seed|d|j) mod N (doc_ids
# are dense 0..N−1 — the q39/q83 convention), bumped by one slot on
# self-collision. Generation is a shuffle-free row-expanding map; the
# single shuffle is the equi-join that enriches the sampled ids with
# their features — and at 100 TB that join can be bucketed away too.
# Hash = md5 48-bit prefix (the q59 pattern), so DuckDB replays it
# bit-for-bit.
# ---------------------------------------------------------------------------

_NEG_K = 4
_NEG_SEED = "negs1"


@register(
    "q101_negative_sampling",
    oracle=f"""
    WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    g AS (
        SELECT d.doc_id, k.k,
               ('0x' || substr(md5('{_NEG_SEED}|'
                    || CAST(d.doc_id AS VARCHAR) || '|'
                    || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % t.n AS raw,
               t.n
        FROM documents d, (SELECT unnest(range({_NEG_K})) AS k) k, t
    ),
    neg AS (
        SELECT doc_id, CAST(k AS BIGINT) AS k,
               CASE WHEN raw = doc_id THEN (raw + 1) % n ELSE raw END
                   AS neg_doc_id
        FROM g
    )
    SELECT neg.doc_id, neg.k, neg.neg_doc_id,
           nd.source AS neg_source, nd.n_chars AS neg_n_chars
    FROM neg JOIN documents nd ON nd.doc_id = neg.neg_doc_id
    """,
)
def q101_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_NEG_K} seeded pseudo-random negatives per anchor document,
    enriched with the negatives' features.

    Scale shape: candidate generation is a narrow map (explode of a
    {_NEG_K}-element literal sequence + hash arithmetic — no RNG state,
    no shuffled copy of the corpus, rerunnable byte-identically on any
    cluster layout); the only shuffle is the feature-fetch equi-join on
    neg_doc_id. Self-pairs are impossible by construction (collision
    bumps to the next id mod N).
    """
    d = load_table(spark, sf_dir, "documents")
    total = d.agg(F.count("*").alias("n"))
    g = (
        d.select("doc_id")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(_NEG_K - 1))
            ).alias("k"),
            "n",
        )
    )
    raw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(_NEG_SEED),
                        F.col("doc_id").cast("string"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % F.col("n")
    )
    neg = g.select(
        "doc_id",
        F.col("k").cast("long").alias("k"),
        F.when(raw == F.col("doc_id"), (raw + 1) % F.col("n"))
        .otherwise(raw)
        .alias("neg_doc_id"),
    )
    feats = d.select(
        F.col("doc_id").alias("neg_doc_id"),
        F.col("source").alias("neg_source"),
        F.col("n_chars").alias("neg_n_chars"),
    )
    return neg.join(feats, "neg_doc_id").select(
        "doc_id", "k", "neg_doc_id", "neg_source", "neg_n_chars"
    )


# ---------------------------------------------------------------------------
# q104 — cascade delete (right-to-be-forgotten): the governance op every
# training-data platform must run — a deletion-request list must purge the
# primary corpus AND every derived artifact (chunk windows, inverted-index
# postings, embedding rows), with PROOF of removal. At 100 TB the shape
# is: the tombstone list is small → broadcast anti-join per artifact +
# rewrite of affected partitions only; the verification is one combinable
# scan per artifact counting surviving references (computed from the
# post-delete frames, not assumed). Chunk accounting uses the q77 closed
# form ((tokens−1)//stride + 1) so the derived-artifact count needs no
# explode.
# ---------------------------------------------------------------------------

_DEL_MOD = 131  # deletion-request rule: doc_id % 131 == 0


@register(
    "q104_cascade_delete",
    oracle=f"""
    WITH tomb AS (SELECT doc_id FROM documents WHERE doc_id % {_DEL_MOD} = 0),
    d AS (
        SELECT doc_id, len(string_split(text, ' ')) AS ntok,
               doc_id % {_DEL_MOD} = 0 AS dead
        FROM documents
    ),
    post AS (
        SELECT DISTINCT doc_id, t.term, doc_id % {_DEL_MOD} = 0 AS dead
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
    ),
    emb AS (
        SELECT vec_id, vec_id % {_DEL_MOD} = 0 AS dead FROM embeddings
    )
    SELECT 'documents' AS artifact,
           CAST(count(*) AS BIGINT) AS n_before,
           CAST(COALESCE(sum(CASE WHEN dead THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_purged,
           CAST(count(*) - COALESCE(sum(CASE WHEN dead THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_after,
           COALESCE(sum(CASE WHEN dead THEN 1 ELSE 0 END), 0)
               = (SELECT count(*) FROM tomb) AS clean
    FROM d
    UNION ALL
    SELECT 'chunks',
           CAST(COALESCE(sum((ntok - 1) // {_CHUNK_STRIDE} + 1), 0) AS BIGINT),
           CAST(COALESCE(sum(CASE WHEN dead THEN (ntok - 1) // {_CHUNK_STRIDE} + 1
                         ELSE 0 END), 0) AS BIGINT),
           CAST(COALESCE(sum(CASE WHEN dead THEN 0
                         ELSE (ntok - 1) // {_CHUNK_STRIDE} + 1 END), 0) AS BIGINT),
           true
    FROM d
    UNION ALL
    SELECT 'postings',
           CAST(count(*) AS BIGINT),
           CAST(COALESCE(sum(CASE WHEN dead THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(*) - COALESCE(sum(CASE WHEN dead THEN 1 ELSE 0 END), 0) AS BIGINT),
           true
    FROM post
    UNION ALL
    SELECT 'embeddings',
           CAST(count(*) AS BIGINT),
           CAST(COALESCE(sum(CASE WHEN dead THEN 1 ELSE 0 END), 0) AS BIGINT),
           CAST(count(*) - COALESCE(sum(CASE WHEN dead THEN 1 ELSE 0 END), 0) AS BIGINT),
           true
    FROM emb
    """,
)
def q104_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purge every artifact referencing a deletion-request doc and verify:
    one tidy row per artifact with before/purged/after counts and a
    clean-verdict COMPUTED by re-scanning the post-delete frame for
    surviving tombstone references.

    The tombstone set broadcasts (deletion lists are small); each
    artifact's delete is a broadcast anti-join; each verdict is a
    combinable aggregate. Nothing here is quadratic in the corpus, and
    the expensive artifact (postings) is counted from one explode +
    distinct — the same cost its original build paid.
    """
    docs = load_table(spark, sf_dir, "documents")
    tomb = docs.where(F.col("doc_id") % _DEL_MOD == 0).select("doc_id")

    tomb_k = tomb.select(F.col("doc_id").alias("tomb_id"))

    def verdict(name, before_df, keyname):
        after = before_df.join(
            F.broadcast(tomb_k),
            F.col(keyname) == F.col("tomb_id"),
            "left_anti",
        )
        survivors = after.join(
            F.broadcast(tomb_k),
            F.col(keyname) == F.col("tomb_id"),
            "left_semi",
        )
        n_b = before_df.agg(F.count("*").alias("nb"))
        n_a = after.agg(F.count("*").alias("na"))
        n_s = survivors.agg(F.count("*").alias("ns"))
        return (
            n_b.join(n_a)
            .join(n_s)
            .select(
                F.lit(name).alias("artifact"),
                F.col("nb").alias("n_before"),
                (F.col("nb") - F.col("na")).alias("n_purged"),
                F.col("na").alias("n_after"),
                (F.col("ns") == 0).alias("clean"),
            )
        )

    d = docs.select("doc_id", F.size(F.split("text", " ")).alias("ntok"))
    chunks = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("ntok") - 1) / _CHUNK_STRIDE).cast("int"),
            )
        ).alias("chunk_idx"),
    )
    postings = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("ref_id")
    )
    return (
        verdict("documents", docs.select("doc_id"), "doc_id")
        .unionAll(verdict("chunks", chunks, "doc_id"))
        .unionAll(verdict("postings", postings, "doc_id"))
        .unionAll(verdict("embeddings", emb, "ref_id"))
    )


# ---------------------------------------------------------------------------
# q105 — corpus snapshot diff: the dataset-versioning audit ("what changed
# between crawl v1 and crawl v2?") every training-data release pipeline
# runs before accepting a new snapshot. v2 is derived from v1 by three
# independent deterministic rules (deletions, in-place modifications,
# re-crawled additions under offset ids), and the diff classifies every
# key via ONE full-outer join on the primary key comparing content
# hashes — at 100 TB: a single co-partitioned shuffle (or none, if both
# snapshots are bucketed on the key), narrow md5 comparison, combinable
# counts. No row bodies cross the network twice: the join carries
# (doc_id, md5, length) only.
# ---------------------------------------------------------------------------

_DIFF_REMOVE = 131  # v2 drops doc_id % 131 == 0
_DIFF_MODIFY = 89  # v2 upper-cases text of doc_id % 89 == 0
_DIFF_ADD = 83  # v2 adds a copy of doc_id % 83 == 0 at doc_id + offset
_DIFF_OFFSET = 1_000_000


@register(
    "q105_corpus_diff",
    oracle=f"""
    WITH v1 AS (
        SELECT doc_id, md5(text) AS h, length(text) AS nc FROM documents
    ),
    v2 AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % {_DIFF_MODIFY} = 0 THEN upper(text)
                        ELSE text END) AS h,
               length(text) AS nc
        FROM documents WHERE doc_id % {_DIFF_REMOVE} <> 0
        UNION ALL
        SELECT doc_id + {_DIFF_OFFSET}, md5(text), length(text)
        FROM documents WHERE doc_id % {_DIFF_ADD} = 0
    )
    SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                WHEN v2.doc_id IS NULL THEN 'removed'
                WHEN v1.h <> v2.h THEN 'modified'
                ELSE 'unchanged' END AS change,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(v1.nc), 0) AS BIGINT) AS chars_v1,
           CAST(coalesce(sum(v2.nc), 0) AS BIGINT) AS chars_v2
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    GROUP BY 1
    """,
)
def q105_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every document key across two corpus snapshots as
    added / removed / modified / unchanged, with per-class doc and char
    accounting.

    The diff never compares text bodies: each side reduces to
    (doc_id, md5, length) in the scan stage, the full-outer join
    co-partitions on doc_id, and the verdict is a combinable aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    v1 = d.select(
        "doc_id", F.md5("text").alias("h"), F.length("text").alias("nc")
    )
    v2 = (
        d.where(F.col("doc_id") % _DIFF_REMOVE != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % _DIFF_MODIFY == 0, F.upper("text")
                ).otherwise(F.col("text"))
            ).alias("h"),
            F.length("text").alias("nc"),
        )
        .unionAll(
            d.where(F.col("doc_id") % _DIFF_ADD == 0).select(
                (F.col("doc_id") + _DIFF_OFFSET).alias("doc_id"),
                F.md5("text").alias("h"),
                F.length("text").alias("nc"),
            )
        )
    )
    a = v1.select(
        F.col("doc_id").alias("k1"),
        F.col("h").alias("h1"),
        F.col("nc").alias("nc1"),
    )
    b = v2.select(
        F.col("doc_id").alias("k2"),
        F.col("h").alias("h2"),
        F.col("nc").alias("nc2"),
    )
    j = a.join(b, a.k1 == b.k2, "full_outer")
    change = (
        F.when(F.col("k1").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "modified")
        .otherwise("unchanged")
    )
    return (
        j.groupBy(change.alias("change"))
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("nc1"), F.lit(0)).alias("chars_v1"),
            F.coalesce(F.sum("nc2"), F.lit(0)).alias("chars_v2"),
        )
    )


# ---------------------------------------------------------------------------
# q120 — quality-gate funnel attribution: which gate drops how many docs.
# Every pretraining pipeline runs a battery of filters; the number that
# matters operationally is PER-GATE attrition in application order (a
# gate that drops 40% gets re-tuned, a gate that drops 0.1% gets
# deleted). Gates here: length band → minimum token count → repetition
# cap (integer-exact, q41's rule) → language.
# ---------------------------------------------------------------------------


def _register_q120() -> None:
    # cumulative gate predicates, SQL + Spark twins (integer-exact)
    g = [
        ("g1_length_band", "n_chars BETWEEN 150 AND 450"),
        ("g2_min_tokens", "n_tokens >= 20"),
        ("g3_repetition_cap", "top_cnt * 4 <= n_tokens"),
        ("g4_lang_en", "lang = 'en'"),
    ]
    cum = [
        " AND ".join(cond for _, cond in g[: i + 1]) for i in range(len(g))
    ]
    funnel_rows = " UNION ALL ".join(
        f"SELECT '{name}' AS gate, s{i} AS n_in, s{i + 1} AS n_out, "
        f"s{i} - s{i + 1} AS n_dropped FROM s"
        for i, (name, _) in enumerate(g)
    )

    @register(
        "q120_quality_funnel",
        oracle=f"""
        WITH tf AS (
            SELECT doc_id, t, count(*) AS cnt
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents
            )
            WHERE t <> ''
            GROUP BY doc_id, t
        ),
        feat AS (
            SELECT doc_id,
                   CAST(sum(cnt) AS BIGINT) AS n_tokens,
                   CAST(max(cnt) AS BIGINT) AS top_cnt
            FROM tf GROUP BY doc_id
        ),
        d AS (
            SELECT documents.doc_id, n_chars, lang, n_tokens, top_cnt
            FROM documents JOIN feat ON documents.doc_id = feat.doc_id
        ),
        s AS (
            SELECT CAST(count(*) AS BIGINT) AS s0,
                   {", ".join(
                       f"CAST(sum(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT)"
                       f" AS s{i + 1}"
                       for i, c in enumerate(cum)
                   )}
            FROM d
        )
        {funnel_rows}
        """,
    )
    def q120_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-gate attrition of the 4-gate quality battery, in
        application order (n_in → n_out → n_dropped per gate).

        Scale shape: token features come from two co-partitioned
        groupBys on doc_id (one explode, one shuffle — the q41 plan);
        the funnel itself is ONE conditional aggregate producing a
        single row of cumulative-survivor counts (map-side combinable),
        unpivoted driver-side into 4 gate rows. Nothing about the
        funnel adds a pass over the corpus beyond the feature build.
        """
        d = load_table(spark, sf_dir, "documents")
        d = d.repartition(
            max(spark.sparkContext.defaultParallelism, 8), "doc_id"
        )
        tok = d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("t")
        ).where(F.col("t") != "")
        tf = tok.groupBy("doc_id", "t").agg(F.count("*").alias("cnt"))
        feat = tf.groupBy("doc_id").agg(
            F.sum("cnt").alias("n_tokens"),
            F.max("cnt").alias("top_cnt"),
        )
        full = d.select("doc_id", "n_chars", "lang").join(feat, "doc_id")
        s = full.agg(
            F.count("*").alias("s0"),
            *[
                F.sum(F.expr(c).cast("long")).alias(f"s{i + 1}")
                for i, c in enumerate(cum)
            ],
        )
        stack = ", ".join(
            f"'{name}', s{i}, s{i + 1}, s{i} - s{i + 1}"
            for i, (name, _) in enumerate(g)
        )
        return s.select(
            F.expr(
                f"stack({len(g)}, {stack})"
            ).alias("gate", "n_in", "n_out", "n_dropped")
        )


_register_q120()


# ---------------------------------------------------------------------------
# q121 — dataset card: the per-source datasheet a corpus release ships
# with (Datasheets for Datasets, Gebru et al.): volume, token mass,
# exact-dup pressure, language mix, and length distribution — one row
# per source, one pass over the corpus.
# ---------------------------------------------------------------------------


def _register_q121() -> None:
    @register(
        "q121_dataset_card",
        oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens,
               CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS pct_en,
               quantile_cont(n_chars, 0.5) AS p50_chars,
               quantile_cont(n_chars, 0.95) AS p95_chars
        FROM documents
        GROUP BY source
        """,
    )
    def q121_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
        """One datasheet row per source: doc/token volume, exact-dup
        pressure (distinct-text count), language share, length quantiles.

        Scale shape: ONE combinable groupBy on source for everything
        except the two order statistics — token counts come from
        `size(split(...))` (narrow, no explode), the dup signal is a
        count-distinct over md5-sized keys at scale (exact here so the
        oracle is literal), and the interpolated percentiles use the
        proven Spark `percentile` == DuckDB `quantile_cont` equivalence
        (q10c). Sources are few, so the final state is dashboard-sized.
        """
        d = load_table(spark, sf_dir, "documents")
        return d.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
            F.countDistinct("text").alias("n_distinct_texts"),
            (
                F.sum((F.col("lang") == "en").cast("long")).cast("double")
                / F.count("*").cast("double")
            ).alias("pct_en"),
            F.expr("percentile(n_chars, 0.5)").alias("p50_chars"),
            F.expr("percentile(n_chars, 0.95)").alias("p95_chars"),
        )


_register_q121()


# ---------------------------------------------------------------------------
# q122 — bigram-rarity document scoring: the bigram upgrade of q52's
# unigram-LM filter. A document whose word BIGRAMS are rare in the corpus
# is either novel or garbage — pretraining pipelines score it and route it
# to human/classifier review. Rarity = mean corpus frequency of the doc's
# bigrams (low mean = rare). Rational arithmetic only (integer counts, one
# final division), so the oracle matches bit-for-bit.
# ---------------------------------------------------------------------------

_BIGRAM_BOTTOM = 40


@register(
    "q122_bigram_rarity",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT doc_id, t.bg
        FROM tok, unnest(list_transform(
            generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i+1]
        )) AS t(bg)
    ),
    freq AS (
        SELECT bg, CAST(count(*) AS BIGINT) AS corpus_tf FROM bg GROUP BY bg
    ),
    scored AS (
        SELECT b.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(f.corpus_tf) AS BIGINT) AS sum_tf
        FROM bg b JOIN freq f ON f.bg = b.bg
        GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, sum_tf,
           CAST(sum_tf AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS mean_tf
    FROM scored
    ORDER BY mean_tf, doc_id
    LIMIT {_BIGRAM_BOTTOM}
    """,
)
def q122_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {_BIGRAM_BOTTOM} rarest documents by mean corpus-bigram
    frequency.

    Plan: one narrow pass builds (doc_id, bigram) via posexplode + lead
    (linear — no per-element re-split, the q28 shingle lesson), one
    shuffle aggregates corpus bigram frequencies (map-side combined), one
    shuffle joins them back and folds per doc, and the bottom-k is a
    TakeOrderedAndProject (per-partition partial top-k, driver merges k
    rows per partition — never a global sort). At 100 TB the bigram
    frequency table is the big intermediate; it is itself aggregated
    (bounded by distinct-bigram count) and the join is key-partitioned on
    the bigram — the same shuffle the frequency count already created, so
    AQE can reuse the exchange. sum_tf stays integer until one final
    division (exact on both engines).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    nxt = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("w2", F.lead("w").over(nxt))
        .where(F.col("w2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w2").alias("bg"))
    )
    freq = bg.groupBy("bg").agg(F.count("*").alias("corpus_tf"))
    scored = (
        bg.join(freq, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("corpus_tf").alias("sum_tf"),
        )
        .withColumn(
            "mean_tf",
            F.col("sum_tf").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )
    return scored.orderBy("mean_tf", "doc_id").limit(_BIGRAM_BOTTOM)


# ---------------------------------------------------------------------------
# q124 — curriculum ordering: bucket the corpus into training phases by a
# difficulty score (easy → hard curriculum). Difficulty here = mean word
# length (chars per token), a cheap stand-in for the classifier scores real
# pipelines use; the operator's value is the deterministic phase assignment
# (ntile over a total order), not the score itself.
# ---------------------------------------------------------------------------

_CURRICULUM_PHASES = 4


@register(
    "q124_curriculum_order",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE)
                   AS difficulty
        FROM documents
    ),
    phased AS (
        SELECT doc_id, source, difficulty,
               ntile({_CURRICULUM_PHASES})
                   OVER (ORDER BY difficulty, doc_id) AS phase
        FROM scored
    )
    SELECT phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(difficulty) AS min_difficulty,
           max(difficulty) AS max_difficulty,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM phased
    GROUP BY phase
    """,
)
def q124_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_CURRICULUM_PHASES}-phase curriculum split by mean-word-length
    difficulty, with per-phase composition stats.

    EXACT ntile without the single-partition window: SQL ntile(k) over n
    rows front-loads the remainder — with q = n div k and r = n mod k the
    first r tiles hold q+1 rows and the rest hold q — so the phase is a
    closed-form function of the row's 1-based rank in the (difficulty,
    doc_id) total order, and the global rank is computed with the
    q100/q83 two-phase layout —
    coarse difficulty buckets (width 0.1 mean-word-length; monotone in the
    sort key) are counted and prefix-summed into start offsets (a tiny
    broadcast), then per-bucket parallel row_numbers shift by their
    bucket's offset. Every window is either bucket-partitioned or
    bucket-count-sized; the corpus-wide sort the naive ntile would ship to
    ONE task never materializes. Difficulty is rational: (chars − spaces)
    / tokens, one division, bit-identical on both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    scored = d.select(
        "doc_id",
        "source",
        (
            (F.col("n_chars") - (ntok - F.lit(1))).cast("double")
            / ntok.cast("double")
        ).alias("difficulty"),
    )
    scored = scored.withColumn(
        "coarse", F.floor(F.col("difficulty") * 10).cast("long")
    )
    counts = scored.groupBy("coarse").agg(F.count("*").alias("cn"))
    woff = Window.orderBy("coarse").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "coarse", F.coalesce(F.sum("cn").over(woff), F.lit(0)).alias("off")
    )
    wb = Window.partitionBy("coarse").orderBy("difficulty", "doc_id")
    ranked = scored.join(F.broadcast(offsets), "coarse").withColumn(
        "rnk", F.row_number().over(wb) + F.col("off")
    )
    total = scored.agg(F.count("*").alias("n"))
    k = _CURRICULUM_PHASES
    # ntile's exact closed form (remainder tiles first); the q=0 branch
    # (n < k) degenerates to phase = rank, matching SQL ntile.
    phased = ranked.join(F.broadcast(total)).withColumn(
        "phase",
        F.expr(
            f"CASE WHEN n < {k} THEN rnk "
            f"WHEN rnk <= (n % {k}) * ((n div {k}) + 1) "
            f"THEN (rnk - 1) div ((n div {k}) + 1) + 1 "
            f"ELSE (n % {k}) + 1 + "
            f"(rnk - (n % {k}) * ((n div {k}) + 1) - 1) div (n div {k}) "
            f"END"
        ).cast("long"),
    )
    return phased.groupBy("phase").agg(
        F.count("*").alias("n_docs"),
        F.min("difficulty").alias("min_difficulty"),
        F.max("difficulty").alias("max_difficulty"),
        F.countDistinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# q125 — temperature-flattened domain sampling: the multinomial-with-
# temperature reweighting (T=2 → square-root scaling) every multilingual /
# multi-domain pretraining mix uses to keep head domains from drowning
# tail domains. All derived quantities are single-op chains on exact
# integer counts (sqrt is correctly rounded in IEEE 754, so Spark and
# DuckDB agree bit-for-bit; no transcendental pow()).
# ---------------------------------------------------------------------------


@register(
    "q125_temperature_mix",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM per_source)
    SELECT s.source, s.n_docs, s.n_chars,
           CAST(s.n_docs AS DOUBLE) / CAST(t.n AS DOUBLE) AS share,
           sqrt(CAST(s.n_docs AS DOUBLE)) / sqrt(CAST(t.n AS DOUBLE))
               AS temp_share,
           sqrt(CAST(t.n AS DOUBLE) / CAST(s.n_docs AS DOUBLE)) AS boost
    FROM per_source s CROSS JOIN tot t
    """,
)
def q125_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source T=2 sampling shares: raw share n_i/N, temperature share
    sqrt(n_i)/sqrt(N), and the resulting sampling boost sqrt(N/n_i).

    One shuffle (the per-source count), then a broadcast of the one-row
    total — the corpus is never rescanned. The normalization DENOMINATOR
    of the final mixture (Σ_i sqrt(n_i)) is deliberately not folded in:
    a float sum over sources is order-sensitive across engines, while
    every emitted column is a fixed chain of exact/correctly-rounded ops —
    the consumer normalizes the (tiny, driver-sized) weight vector.
    """
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    tot = per_source.agg(F.sum("n_docs").alias("n"))
    nd, n = F.col("n_docs").cast("double"), F.col("n").cast("double")
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_chars",
            (nd / n).alias("share"),
            (F.sqrt(nd) / F.sqrt(n)).alias("temp_share"),
            F.sqrt(n / nd).alias("boost"),
        )
    )


# ---------------------------------------------------------------------------
# q134 — per-source language-purity audit via Gini impurity. Dataset cards
# report "how mixed is each source?"; Gini (1 − Σ p_l²) is the standard
# impurity and — unlike entropy — needs no transcendental log, so it stays
# bit-checkable: impurity = (n² − Σ n_l²) / n² on exact integers with one
# final division.
# ---------------------------------------------------------------------------


@register(
    "q134_source_gini",
    oracle="""
    WITH by_lang AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n_l
        FROM documents GROUP BY source, lang
    ),
    rolled AS (
        SELECT source,
               CAST(sum(n_l) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_langs,
               CAST(sum(n_l * n_l) AS BIGINT) AS sum_sq
        FROM by_lang GROUP BY source
    )
    SELECT source, n_docs, n_langs,
           CAST(n_docs * n_docs - sum_sq AS DOUBLE)
               / CAST(n_docs * n_docs AS DOUBLE) AS gini
    FROM rolled
    """,
)
def q134_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix Gini impurity per source (0 = monolingual source).

    Two map-side-combinable aggregations — (source, lang) counts, then a
    per-source rollup of Σn_l and Σn_l² — so the shuffled payload is one
    row per (source, lang), never per document. The impurity itself is
    computed as (n² − Σn_l²)/n² on int64 (counts at sf well below the
    2³¹ bound where n² would overflow int64 per source-lang cell; at true
    100 TB corpus scale promote the squares to DECIMAL(38,0), same plan).
    """
    d = load_table(spark, sf_dir, "documents")
    by_lang = d.groupBy("source", "lang").agg(F.count("*").alias("n_l"))
    rolled = by_lang.groupBy("source").agg(
        F.sum("n_l").alias("n_docs"),
        F.count("*").alias("n_langs"),
        F.sum(F.col("n_l") * F.col("n_l")).alias("sum_sq"),
    )
    nn = F.col("n_docs") * F.col("n_docs")
    return rolled.select(
        "source",
        "n_docs",
        "n_langs",
        ((nn - F.col("sum_sq")).cast("double") / nn.cast("double")).alias(
            "gini"
        ),
    )


# ---------------------------------------------------------------------------
# q135 — k-anonymity audit: before a corpus release, every combination of
# quasi-identifiers must cover at least k individuals/documents, or the
# combination is a re-identification risk. The governance gate next to
# q104 (deletion) and q121 (datasheet).
# ---------------------------------------------------------------------------

_K_ANON = 5
_QI_BUCKET = 64  # length-bucket granularity of the quasi-identifier


@register(
    "q135_k_anonymity",
    oracle=f"""
    WITH qi AS (
        SELECT lang, source,
               CAST(n_chars // {_QI_BUCKET} AS BIGINT) AS len_bucket,
               doc_id
        FROM documents
    ),
    grp AS (
        SELECT lang, source, len_bucket,
               CAST(count(*) AS BIGINT) AS group_size
        FROM qi GROUP BY lang, source, len_bucket
    )
    SELECT lang, source, len_bucket, group_size,
           (group_size < {_K_ANON}) AS violates_k
    FROM grp
    """,
)
def q135_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity ({_K_ANON}) audit over the quasi-identifier tuple
    (lang, source, {_QI_BUCKET}-char length bucket): every group with its
    size and a violation flag.

    One map-side-combinable groupBy; shuffle payload is one row per QI
    combination (bounded by the QI domain product, not the corpus). At
    100 TB the follow-up actions — suppress or generalize violating
    groups — are an anti-join / CASE generalization against this exact
    output, both broadcast-sized because violations are by definition
    small groups.
    """
    d = load_table(spark, sf_dir, "documents")
    grp = (
        d.select(
            "lang",
            "source",
            (F.col("n_chars") / _QI_BUCKET).cast("long").alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count("*").alias("group_size"))
    )
    return grp.withColumn("violates_k", F.col("group_size") < _K_ANON)


# ---------------------------------------------------------------------------
# q142 — policy-driven column masking (row/column-level security): a
# broadcast policy table decides, per source, how much of each document
# leaves the corpus — cleartext, fingerprint-only, or fully redacted.
# The release-gate companion to q40 (PII scrub) and q135 (k-anonymity):
# q40 redacts patterns, q142 enforces per-SOURCE contractual policy.
# ---------------------------------------------------------------------------

_MASK_PREVIEW = 32


@register(
    "q142_policy_masking",
    oracle=f"""
    WITH policy AS (
        SELECT source, CAST(substr(md5(source), 1, 1) AS VARCHAR) AS nib,
               CASE
                   WHEN ('0x' || substr(md5(source), 1, 1))::BIGINT % 3 = 0
                       THEN 'clear'
                   WHEN ('0x' || substr(md5(source), 1, 1))::BIGINT % 3 = 1
                       THEN 'fingerprint'
                   ELSE 'redact'
               END AS policy
        FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT d.doc_id, d.source, p.policy,
           CASE p.policy
               WHEN 'clear' THEN substr(d.text, 1, {_MASK_PREVIEW})
               WHEN 'fingerprint' THEN md5(d.text)
               ELSE '[REDACTED]'
           END AS released_text,
           CASE p.policy WHEN 'clear' THEN d.n_chars ELSE NULL END
               AS released_chars
    FROM documents d JOIN policy p ON p.source = d.source
    """,
)
def q142_policy_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a per-source release policy (derived deterministically from
    md5(source) so the oracle can replicate it; in production it is a
    governance table): clear sources release a {_MASK_PREVIEW}-char
    preview + length, fingerprint sources release only md5(text), redact
    sources release a fixed marker and NULL metadata.

    Scale shape: the policy table is distinct-source-sized and BROADCAST;
    masking is a codegen'd CASE projection over the single corpus scan —
    zero shuffles end to end (plan-gated). This is the shape row/column-
    level security takes in every lakehouse engine: policy join + masked
    projection, never a second pass.
    """
    d = load_table(spark, sf_dir, "documents")
    policy = (
        d.select("source")
        .distinct()
        .withColumn(
            "policy",
            F.when(
                F.conv(F.substring(F.md5("source"), 1, 1), 16, 10).cast(
                    "long"
                )
                % 3
                == 0,
                "clear",
            )
            .when(
                F.conv(F.substring(F.md5("source"), 1, 1), 16, 10).cast(
                    "long"
                )
                % 3
                == 1,
                "fingerprint",
            )
            .otherwise("redact"),
        )
    )
    joined = d.join(F.broadcast(policy), "source")
    return joined.select(
        "doc_id",
        "source",
        "policy",
        F.when(
            F.col("policy") == "clear",
            F.substring("text", 1, _MASK_PREVIEW),
        )
        .when(F.col("policy") == "fingerprint", F.md5("text"))
        .otherwise(F.lit("[REDACTED]"))
        .alias("released_text"),
        F.when(F.col("policy") == "clear", F.col("n_chars")).alias(
            "released_chars"
        ),
    )


# ---------------------------------------------------------------------------
# q153 — systematic size-proportional sampling (deterministic, weight-aware).
#
# Corpus downsampling where a document's selection probability is
# proportional to its length: lay every doc's n_chars end-to-end on a
# virtual tape (ordered by doc_id), cut the tape into N equal stripes,
# and keep each doc that spans a stripe boundary. Pure integer
# arithmetic, so Spark and DuckDB agree exactly — no RNG, no
# transcendentals — yet statistically it is classic systematic PPS
# (probability-proportional-to-size) sampling.
#
# The scale point is the PREFIX SUM: a single global running total is a
# one-partition window — the anti-pattern. This implementation uses the
# two-phase distributed form: per-range-bucket subtotals (one small agg),
# a driver-sized bucket-offset table cum-summed and broadcast back, then
# per-bucket local cumsums that shuffle in parallel. Same structure a
# 1000-executor cluster needs for any ordered running total.
# ---------------------------------------------------------------------------

_SYS_N = 64  # target sample size (stripe count)
_SYS_BUCKETS = 32  # prefix-sum range buckets


@register(
    "q153_systematic_weighted_sample",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, source, n_chars AS w,
               CAST(sum(n_chars) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS cum
        FROM documents
    ),
    t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS w_total FROM documents),
    s AS (
        SELECT c.*, greatest(1, t.w_total // {_SYS_N}) AS step
        FROM c, t
    )
    SELECT doc_id, source, w,
           CAST(cum // step AS BIGINT) AS stripe
    FROM s
    WHERE (cum - w) // step < cum // step
    """,
)
def q153_systematic_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep every document that crosses one of {_SYS_N} equal-weight stripe
    boundaries on the doc_id-ordered n_chars tape.

    Distributed prefix sum: doc_ids are range-bucketed ({_SYS_BUCKETS}
    buckets), bucket subtotals aggregate in one pass, bucket offsets
    cum-sum on a {_SYS_BUCKETS}-row frame (metadata-sized — the only
    single-partition step), and the per-doc running total is a window
    WITHIN each bucket plus its broadcast offset. No stage ever funnels
    the corpus through one task, so the plan survives a 100× corpus by
    adding buckets, not serializing.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("w")
    )
    max_id = d.agg(F.max("doc_id")).first()[0]  # scalar, driver-sized
    # max over an empty corpus is NULL → any span works (zero rows bucket)
    span = max(1, (int(max_id or 0) + _SYS_BUCKETS) // _SYS_BUCKETS)
    d = d.withColumn("bkt", (F.col("doc_id") / span).cast("long"))

    sub = d.groupBy("bkt").agg(F.sum("w").alias("bw"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sub.select(
        "bkt",
        F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("off"),
        F.sum("bw").over(
            Window.orderBy("bkt").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("w_total"),
    )

    w_local = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        d.withColumn("local_cum", F.sum("w").over(w_local))
        .join(F.broadcast(offsets), "bkt")
        .select(
            "doc_id",
            "source",
            "w",
            (F.col("local_cum") + F.col("off")).alias("cum"),
            F.greatest(F.lit(1), F.expr(f"w_total div {_SYS_N}")).alias("step"),
        )
    )
    return cum.where(
        F.expr("(cum - w) div step") < F.expr("cum div step")
    ).select(
        "doc_id",
        "source",
        "w",
        F.expr("cum div step").cast("long").alias("stripe"),
    )


# ---------------------------------------------------------------------------
# q159 — Neyman (variance-optimal) stratified sampling allocation, computed
# in EXACT integer algebra. Classic survey-sampling math (n_h ∝ N_h·σ_h)
# is float-fragile across engines: variance accumulates in
# shuffle-order-dependent floats and Σ N_h·σ_h sums doubles in row order.
# This implementation keeps everything order-independent:
#   var_num_h = N_h·Σx² − (Σx)²   (exact BIGINT — the un-normalized
#                                  variance numerator, N_h²·Var)
#   sd_floor_h = floor(sqrt(var_num_h))  (sqrt is correctly rounded IEEE
#                                  on both engines → identical BIGINT)
#   weight_h = N_h·sd_floor_h ; share_bp = weight·10⁴ // Σweight
# so the allocation table is bit-stable at any parallelism. The same
# technique (integer variance numerators) is how distributed engines
# compare variances without trusting float reduction order.
# ---------------------------------------------------------------------------


@register(
    "q159_neyman_allocation",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS sumsq
        FROM documents GROUP BY source
    ),
    v AS (
        SELECT source, n_docs, sum_chars,
               n_docs * sumsq - sum_chars * sum_chars AS var_num,
               CAST(floor(sqrt(CAST(n_docs * sumsq - sum_chars * sum_chars
                                    AS DOUBLE))) AS BIGINT) AS sd_floor
        FROM s
    ),
    w AS (SELECT *, n_docs * sd_floor AS weight FROM v),
    t AS (SELECT CAST(sum(weight) AS BIGINT) AS total_w FROM w)
    SELECT w.source, w.n_docs, w.var_num, w.sd_floor,
           -- NULLIF: all-singleton strata have zero total variance
           -- weight; the share is undefined → NULL on both engines
           CAST(w.weight * 10000 // NULLIF(t.total_w, 0) AS BIGINT)
               AS share_bp
    FROM w, t
    """,
)
def q159_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling shares (basis points) proportional to
    N_h·floor(σ̂_h) with the variance numerator in exact BIGINT algebra.

    One map-side-combinable aggregate over the corpus (count/sum/sum-of-
    squares — all associative integers), then a one-row total broadcast.
    Nothing in the plan depends on reduction order, which is the entire
    point: the allocation a 1000-executor run produces equals this one's.
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sumsq"),
    )
    v = s.select(
        "source",
        "n_docs",
        (F.col("n_docs") * F.col("sumsq") - F.col("sum_chars") * F.col("sum_chars"))
        .alias("var_num"),
    ).withColumn(
        "sd_floor",
        F.floor(F.sqrt(F.col("var_num").cast("double"))).cast("long"),
    ).withColumn("weight", F.col("n_docs") * F.col("sd_floor"))
    total = v.agg(F.sum("weight").alias("total_w"))
    return v.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "var_num",
        "sd_floor",
        F.expr("weight * 10000 div NULLIF(total_w, 0)").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# q178 — corpus Merkle tree: tamper-evident content integrity in log
# depth. Leaf = md5(doc_id ':' md5(text)); internal node = md5 of its
# children's hashes concatenated in doc_id order; root commits to the
# entire corpus. Verifying a 100 TB release then needs only the root
# (and any audited subtree re-hashes just its bucket — O(bucket), not
# O(corpus)). Every level is ONE combinable groupBy whose output is
# 64× smaller than its input, so the tree costs barely more than a scan;
# the ordered child concatenation uses array_sort(collect_list(...)) —
# exact, parallelism-independent. DuckDB twin: string_agg ORDER BY.
# ---------------------------------------------------------------------------

_MERKLE_FAN = 64


@register(
    "q178_merkle_tree_integrity",
    oracle=f"""
    WITH leaf AS (
        SELECT doc_id,
               doc_id // {_MERKLE_FAN} AS b1,
               md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)) AS h
        FROM documents
    ),
    l1 AS (
        SELECT b1, b1 // {_MERKLE_FAN} AS b2,
               md5(string_agg(h, '' ORDER BY doc_id)) AS h
        FROM leaf GROUP BY b1
    ),
    l2 AS (
        SELECT b2, md5(string_agg(h, '' ORDER BY b1)) AS h
        FROM l1 GROUP BY b2
    ),
    root AS (
        -- COALESCE: the empty corpus's root is md5('') — Spark's
        -- array_join over an empty collect_list is '' while string_agg
        -- over zero rows is NULL (empty-corpus contract)
        SELECT md5(COALESCE(string_agg(h, '' ORDER BY b2), '')) AS h FROM l2
    )
    SELECT 'L2:' || CAST(b2 AS VARCHAR) AS node, h FROM l2
    UNION ALL
    SELECT 'ROOT' AS node, h FROM root
    """,
)
def q178_merkle_tree_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-2 Merkle nodes + the corpus root (fan-out {_MERKLE_FAN}).

    Each level: groupBy + ordered-concat + md5 — a combinable aggregate
    over monotonically shrinking data. The collect_list per node is
    bounded by the fan-out (64 fixed-size hashes), never by the corpus.
    """

    def level(df, child_key: str, parent_key_expr, order_col: str):
        return (
            df.groupBy(parent_key_expr.alias(child_key))
            .agg(
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct(order_col, "h"))
                            ),
                            lambda x: x["h"],
                        ),
                        "",
                    )
                ).alias("h")
            )
        )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"doc_id div {_MERKLE_FAN}").alias("b1"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.md5("text"))
        ).alias("h"),
    )
    l1 = level(
        d.withColumn("b2", F.expr(f"b1 div {_MERKLE_FAN}")),
        "b1x",
        F.col("b1"),
        "doc_id",
    ).withColumnRenamed("b1x", "b1").withColumn(
        "b2", F.expr(f"b1 div {_MERKLE_FAN}")
    )
    l2 = level(l1, "b2x", F.col("b2"), "b1").withColumnRenamed("b2x", "b2")
    root = l2.agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b2", "h"))),
                    lambda x: x["h"],
                ),
                "",
            )
        ).alias("h")
    )
    nodes = l2.select(
        F.concat(F.lit("L2:"), F.col("b2").cast("string")).alias("node"), "h"
    )
    return nodes.unionByName(root.select(F.lit("ROOT").alias("node"), "h"))


# ---------------------------------------------------------------------------
# q180 — packing-efficiency curve: sequence count and token utilization of
# the q38 contiguous-fill packer at THREE context budgets, from one scan.
# Contiguous fill makes the curve closed-form: a bucket holding T tokens
# spans floor((T−1)/B)+1 packs, so the whole capacity-planning table is a
# per-bucket aggregate plus arithmetic — the "what does a 4k→8k context
# switch save us" question answered without re-running the packer.
# ---------------------------------------------------------------------------

_PACK_CURVE_BUDGETS = (256, 512, 1024)


@register(
    "q180_packing_efficiency_curve",
    oracle=f"""
    WITH d AS (
        SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
        FROM documents
    ),
    b AS (
        SELECT bucket, CAST(sum(est_tokens) AS BIGINT) AS bt
        FROM d GROUP BY bucket
    )
    SELECT v.budget,
           CAST(sum((b.bt - 1) // v.budget + 1) AS BIGINT) AS n_packs,
           CAST(sum(b.bt) AS BIGINT) AS total_tokens,
           CAST(sum(b.bt) AS DOUBLE)
               / CAST(sum((b.bt - 1) // v.budget + 1) * v.budget AS DOUBLE)
               AS utilization
    FROM b, (VALUES {", ".join(f"({b})" for b in _PACK_CURVE_BUDGETS)})
         v(budget)
    GROUP BY v.budget
    """,
)
def q180_packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(budget, n_packs, total_tokens, utilization) for budgets
    {_PACK_CURVE_BUDGETS} under q38's contiguous-fill packing semantics.

    One combinable per-bucket aggregate, then constant-size arithmetic —
    the curve's cost does not depend on how many budgets are evaluated.
    """
    d = load_table(spark, sf_dir, "documents").select(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.ceil(F.length("text") / 4.0).alias("est_tokens"),
    )
    b = d.groupBy("bucket").agg(F.sum("est_tokens").alias("bt"))
    budgets = spark.createDataFrame(
        [(x,) for x in _PACK_CURVE_BUDGETS], "budget int"
    )
    return (
        b.crossJoin(F.broadcast(budgets))
        .groupBy("budget")
        .agg(
            F.sum(F.expr("(bt - 1) div budget + 1")).alias("n_packs"),
            F.sum("bt").alias("total_tokens"),
            (
                F.sum("bt").cast("double")
                / (
                    F.sum(F.expr("(bt - 1) div budget + 1")) * F.first("budget")
                ).cast("double")
            ).alias("utilization"),
        )
    )


# ---------------------------------------------------------------------------
# q187 — hashed-n-gram linear quality classifier (fastText-style scoring).
# The workhorse of modern corpus curation (CCNet/RefinedWeb/FineWeb-style
# "educational value" / quality filters) is a linear model over hashed
# token features. The heavy lift at 100 TB is the SCORING pass, and that
# is exactly what this pins: token → fixed-width feature bucket → weight
# lookup → per-doc accumulate → threshold. Weights here are derived
# deterministically from the bucket id (a stand-in for a broadcast learned
# weight table of the same shape — the plan is identical either way).
# Integer milli-weights accumulate in BIGINT (float summation order never
# enters); the single final division is exact IEEE on both engines.
# ---------------------------------------------------------------------------

_QC_BUCKETS = 1024  # feature-hash width
_QC_MULT = 2654435761  # Knuth multiplicative constant for the weight table


@register(
    "q187_quality_classifier",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t.tok
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    ),
    feat AS (
        SELECT doc_id,
               (('0x' || substr(md5(tok), 1, 8))::BIGINT % {_QC_BUCKETS})
                   AS bucket
        FROM tok
    ),
    scored AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum((bucket * {_QC_MULT}) % 2001 - 1000) AS BIGINT)
                   AS logit_milli
        FROM feat GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, logit_milli,
           CAST(logit_milli AS DOUBLE) / (1000.0 * n_tokens) AS score,
           logit_milli > 0 AS keep
    FROM scored
    """,
)
def q187_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document linear quality score over {_QC_BUCKETS} hashed token
    features, with the keep/drop verdict a production filter would gate on.

    Scale shape: explode + hash + groupBy(doc_id) with map-side combine —
    one narrow corpus pass, no joins (the weight table is a pure function
    here; a learned one broadcasts at ~{_QC_BUCKETS} rows). The md5-derived
    bucket is the portable-hash pattern (q28c2): both engines read the
    first 8 hex chars as an i64, so bucket and weight agree bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % _QC_BUCKETS
        ).alias("bucket"),
    )
    scored = feat.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(
            (F.col("bucket") * F.lit(_QC_MULT)) % 2001 - 1000
        ).cast("long").alias("logit_milli"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit_milli",
        (
            F.col("logit_milli").cast("double")
            / (F.lit(1000.0) * F.col("n_tokens"))
        ).alias("score"),
        (F.col("logit_milli") > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# q190 — per-source winsorized length statistics: clip each source's
# document lengths at its own exact P05/P95 (percentile_disc semantics:
# the smallest value whose cumulative rank reaches the target) and report
# the winsorized totals. Outlier clipping is how length-based quality
# signals are made robust before thresholding; doing it EXACTLY and
# per-source is the part worth pinning (approx_percentile drifts between
# engines, and a global clip misprices sources with different length
# regimes).
# ---------------------------------------------------------------------------


@register(
    "q190_winsorized_stats",
    oracle="""
    WITH r AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    cuts AS (
        SELECT source,
               max(n) AS n_docs,
               max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                        THEN n_chars END) AS p05,
               max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                        THEN n_chars END) AS p95
        FROM r GROUP BY source
    )
    SELECT d.source,
           cuts.n_docs,
           cuts.p05,
           cuts.p95,
           CAST(sum(CASE WHEN d.n_chars < cuts.p05 THEN cuts.p05
                         WHEN d.n_chars > cuts.p95 THEN cuts.p95
                         ELSE d.n_chars END) AS BIGINT) AS winsorized_chars,
           CAST(sum(CASE WHEN d.n_chars < cuts.p05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(sum(CASE WHEN d.n_chars > cuts.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high
    FROM documents d JOIN cuts ON d.source = cuts.source
    GROUP BY d.source, cuts.n_docs, cuts.p05, cuts.p95
    """,
)
def q190_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source P05/P95 winsorization of document lengths.

    Scale shape: the rank window partitions BY SOURCE (parallel across
    sources; within a source, lengths are the only windowed payload), the
    per-source cut table is tiny and broadcasts back onto the corpus, and
    the final aggregate map-side-combines. All integer arithmetic — the
    clip boundaries are actual data values (percentile_disc), never an
    interpolated float.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    r = d.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count("*").over(wn)
    )
    cuts = r.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.05 * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias("p05"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long"),
                F.col("n_chars"),
            )
        ).alias("p95"),
    )
    clipped = d.join(F.broadcast(cuts), "source").select(
        "source",
        "n_docs",
        "p05",
        "p95",
        F.when(F.col("n_chars") < F.col("p05"), F.col("p05"))
        .when(F.col("n_chars") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("n_chars"))
        .alias("w_chars"),
        (F.col("n_chars") < F.col("p05")).cast("long").alias("lo"),
        (F.col("n_chars") > F.col("p95")).cast("long").alias("hi"),
    )
    return clipped.groupBy("source", "n_docs", "p05", "p95").agg(
        F.sum("w_chars").cast("bigint").alias("winsorized_chars"),
        F.sum("lo").cast("bigint").alias("n_clipped_low"),
        F.sum("hi").cast("bigint").alias("n_clipped_high"),
    )


# ---------------------------------------------------------------------------
# q191 — per-domain document cap: keep at most K docs per source, best
# first (here: longest, tie-broken by doc_id). Every production mixture
# caps over-represented domains; the cap must be deterministic (stable
# under re-runs and shard order) and must never funnel the corpus through
# a global sort — per-source top-K is windowed WITHIN each source.
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 15


@register(
    "q191_domain_cap",
    oracle=f"""
    WITH r AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars,
           CAST(sum(CASE WHEN rn > {_DOMAIN_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS dropped_chars
    FROM r GROUP BY source
    """,
)
def q191_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at {_DOMAIN_CAP} docs (longest-first, doc_id
    tie-break) and account for what the cap keeps vs drops.

    Scale shape: one window partitioned by source (parallel across the
    domain axis — at 100 TB a skewed mega-domain additionally pre-prunes
    with a per-partition partial top-K before the window, the q70
    pattern), then a map-side-combined aggregate. No global ordering
    anywhere.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    r = d.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") <= _DOMAIN_CAP
    return r.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum(kept.cast("long")).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
        F.sum(F.when(~kept, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("dropped_chars"),
    )


# ---------------------------------------------------------------------------
# q218 — the composed CURATION pipeline over the round-5 gates: language-
# label QA (q198's marker predictor) → corpus-LM in-distribution filter
# (q188's char-trigram score) → repetition-span gate (q210) → linear
# quality classifier (q187) → near-dup dedup against the memoized cluster
# index (q28e), reported as a six-stage funnel (docs + token budget per
# stage) from ONE lazy plan. q90 proved the round-1 stages compose; this
# proves the round-5 curation ops integrate as a chain, not just solo —
# same oracle discipline: DuckDB replays the full chain, so the whole
# funnel is hash-verified end to end.
#
# Gate constants are pipeline parameters (tuned so each stage bites on the
# synthetic corpus): every gate is INTEGER arithmetic (cross-multiplied
# thresholds — never a float compare), so the funnel is exact on both
# engines.
# ---------------------------------------------------------------------------

_CUR_LM_K = 172  # keep iff freq_sum * K >= n_tris * total  (score >= 1/K)
_CUR_REP_MAX = 2  # keep iff most-repeated word-5-gram occurs <= this
_CUR_QC_MILLI = 115  # keep iff logit_milli > -QC_MILLI * n_tokens

_FUNNEL_STAGES = (
    "all", "lang_qa", "lm_filter", "repetition", "classifier", "dedup",
)


def _lm_flag_udf(model_pairs: list[tuple[str, int]], total: int):
    """Vectorized in-distribution LM gate as ONE Python crossing per Arrow
    batch (guide §4.2), replacing the per-batch char-trigram explode +
    broadcast-model join + per-doc aggregate (the q220 funnel's measured
    per-batch floor: the explode alone was ~1.05s of the 1.53s LM stage).

    Exact same integer arithmetic as the join plan: for each doc,
    S = Σ model_n(tri) and C = count over the doc's trigram OCCURRENCES
    that match the model; f_lm = (S·K ≥ C·total), and docs with no
    matched occurrence are False (the join plan drops them and the
    caller coalesces to False). Implementation: the whole pandas batch
    of texts is decoded to one codepoint array (utf-32, so multibyte
    text indexes exactly like substring()) with an out-of-range
    sentinel between docs — boundary-spanning trigrams contain the
    sentinel and can never match — then every trigram is packed into
    one int64 (3 × 22 bits; max codepoint 0x10FFFF < 2^21), matched
    against the sorted model codes with searchsorted, and S/C fold back
    per doc with add.reduceat. No shuffle, no join, no per-row Python.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not model_pairs or total is None:
        # empty corpus/model (n=0 contract): the join plan produces no lm
        # rows and every doc coalesces to False — mirror that exactly
        def f_false(texts):
            return pd.Series(np.zeros(len(texts), dtype=bool))

        f_false.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        return pandas_udf(f_false, "boolean")

    # sentinel: above every valid codepoint (max 0x10FFFF) yet still
    # inside 21 bits, so three packed fields (top bit 20+42=62) fit int64
    _SENT = np.int64(0x110000)
    codes = np.empty(len(model_pairs), dtype=np.int64)
    ns = np.empty(len(model_pairs), dtype=np.int64)
    for j, (t, n) in enumerate(model_pairs):
        a, b, c = (ord(ch) for ch in t)
        codes[j] = (np.int64(a) << 42) | (np.int64(b) << 21) | np.int64(c)
        ns[j] = n
    order = np.argsort(codes)
    m_codes, m_ns = codes[order], ns[order]
    k, tot = int(_CUR_LM_K), int(total)

    def f_lm(texts):
        n_docs = len(texts)
        if n_docs == 0:
            return pd.Series([], dtype="bool")
        bufs = [
            (t if isinstance(t, str) else "").encode("utf-32-le")
            for t in texts
        ]
        lens = np.fromiter(
            (len(b) // 4 for b in bufs), dtype=np.int64, count=n_docs
        )
        # one flat codepoint array, sentinel-separated (trailing sentinel
        # pads the last doc's tail so every doc owns len(doc)+1 slots)
        n_tot = int(lens.sum()) + n_docs
        flat = np.full(n_tot, _SENT, dtype=np.int64)
        starts = np.zeros(n_docs, dtype=np.int64)
        pos = 0
        for i, b in enumerate(bufs):
            starts[i] = pos
            cp = np.frombuffer(b, dtype=np.uint32).astype(np.int64)
            flat[pos : pos + len(cp)] = cp
            pos += len(cp) + 1
        if n_tot < 3:
            return pd.Series(np.zeros(n_docs, dtype=bool))
        tri = (flat[:-2] << 42) | (flat[1:-1] << 21) | flat[2:]
        idx = np.searchsorted(m_codes, tri)
        np.clip(idx, 0, len(m_codes) - 1, out=idx)
        hit = m_codes[idx] == tri
        contrib = np.where(hit, m_ns[idx], 0)
        # reduceat over doc start offsets folds S and C per doc; the
        # sentinel slots between docs contribute 0 to both
        bounds = np.minimum(starts, len(tri) - 1)
        s = np.add.reduceat(contrib, bounds)
        c = np.add.reduceat(hit.astype(np.int64), bounds)
        # reduceat quirk: a doc whose start offset equals the next one
        # (empty doc at the array tail) still gets the next segment's
        # sum — mask those to 0 via the hit count of an empty segment
        empty = lens < 3
        ok = (~empty) & (c > 0) & (s * k >= c * tot)
        return pd.Series(ok)

    # `from __future__ import annotations` stringifies hints module-wide
    # and pandas_udf's signature inspection rejects string annotations —
    # attach real objects instead
    f_lm.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(f_lm, "boolean")


def _curation_lm_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(model, total) of the q188 char-trigram LM over the corpus —
    re-aggregated from the memoized per-doc trigram-count frame (one
    corpus explode per snapshot, shared with q188/q211); the streaming
    twin applies the same static model per batch (models are trained
    offline, applied in-stream)."""
    from spark_state_provider_spark.operators.text import (
        _chartri_counts_persisted,
    )

    dtc = _chartri_counts_persisted(spark, sf_dir)
    model = dtc.groupBy("tri").agg(F.sum("c").alias("n"))
    tot = model.agg(F.sum("n").cast("bigint").alias("total"))
    return model, tot


def _curation_flags(
    docs: DataFrame,
    model: DataFrame,
    tot: DataFrame,
    preagg_lm: bool = True,
    dtc: DataFrame | None = None,
    lm_udf=None,
) -> DataFrame:
    """Per-document gate flags (doc_id, est_tokens, f_lang, f_lm, f_rep,
    f_clf) over any documents-shaped frame (doc_id, text, lang). All four
    gates are per-doc with broadcast/static models, so the flags of a
    document are identical whether it arrives in a batch table or a
    micro-batch slice — the invariant the streaming twin's shared oracle
    rests on.

    ``preagg_lm`` picks the LM-probe plan: True pre-aggregates per-doc
    trigram counts so the broadcast probe touches |distinct (doc, tri)|
    rows — right for a full-corpus pass, where the dedup shrink dwarfs
    the extra shuffle. False probes occurrences directly with NO shuffle
    — right for micro-batch slices, where a per-batch exchange costs
    more than the handful of duplicate probes saves (measured: the
    streaming twin regressed 7.0 → 9.6s at sf0.1 under the pre-agg
    plan). Both produce bit-identical flags. ``dtc`` optionally supplies
    an already-materialized (doc_id, tri, c) frame (the corpus memo) so
    a full-corpus caller skips the explode entirely."""
    from spark_state_provider_spark.operators.text import (
        LANG_MARKERS,
        _count_sql,
    )

    langs = sorted(LANG_MARKERS)
    d = docs.select(
        "doc_id",
        "text",
        "lang",
        F.ceil(F.length("text") / 4.0).cast("long").alias("est_tokens"),
        F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("p"),
    )
    # lang QA — marker-count argmax equals the label (pure expressions)
    scored = d
    for lg in langs:
        expr = " + ".join(_count_sql("p", m) for m in LANG_MARKERS[lg])
        scored = scored.withColumn(
            f"score_{lg}", F.expr(f"CAST({expr} AS BIGINT)")
        )
    g = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(F.col(f"score_{lg}") == g, lg).otherwise(pred)
    base = scored.select(
        "doc_id",
        "est_tokens",
        (pred == F.col("lang")).alias("f_lang"),
        "text",
    )
    # corpus-LM in-distribution (q188's model, integer cross-multiplied)
    if lm_udf is not None:
        # vectorized single-crossing gate (guide §4.2): f_lm is a column
        # of base — no explode, no model join, no per-gate left join
        lm = None
    elif preagg_lm:
        if dtc is None:
            dtc = (
                d.where(F.length("text") >= 3)
                .select(
                    "doc_id",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, length(text) - 2),"
                            " i -> substring(text, i, 3))"
                        )
                    ).alias("tri"),
                )
                .groupBy("doc_id", "tri")
                .agg(F.count("*").alias("c"))
            )
        lm = (
            dtc.join(F.broadcast(model), "tri")
            .crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(
                (
                    F.sum(F.col("c") * F.col("n")).cast("bigint")
                    * _CUR_LM_K
                    >= F.sum("c") * F.max("total")
                ).alias("f_lm")
            )
        )
    else:
        tri = d.where(F.length("text") >= 3).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("tri"),
        )
        lm = (
            tri.join(F.broadcast(model), "tri")
            .crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(
                (
                    F.sum("n").cast("bigint") * _CUR_LM_K
                    >= F.count("*") * F.max("total")
                ).alias("f_lm")
            )
        )
    # repetition spans (q210's per-doc 5-gram profile)
    toks = d.select("doc_id", F.split("text", " ").alias("l")).where(
        F.size("l") >= 5
    )
    join5 = " || ' ' || ".join(f"l[i + {j}]" for j in range(5))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(f"transform(sequence(0, size(l) - 5), i -> {join5})")
        ).alias("g"),
    )
    rep = (
        grams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") <= _CUR_REP_MAX).alias("f_rep"))
    )
    # linear quality classifier (q187's hashed features)
    clf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
                .cast("long")
                % _QC_BUCKETS
            ).alias("bucket"),
        )
        .groupBy("doc_id")
        .agg(
            (
                F.sum((F.col("bucket") * F.lit(_QC_MULT)) % 2001 - 1000)
                .cast("long")
                > F.lit(-_CUR_QC_MILLI) * F.count("*")
            ).alias("f_clf")
        )
    )
    out = base if lm is None else base.join(lm, "doc_id", "left")
    return (
        out.join(rep, "doc_id", "left")
        .join(clf, "doc_id", "left")
        .select(
            "doc_id",
            "est_tokens",
            F.coalesce("f_lang", F.lit(False)).alias("f_lang"),
            (
                lm_udf("text")
                if lm_udf is not None
                else F.coalesce("f_lm", F.lit(False))
            ).alias("f_lm"),
            F.coalesce("f_rep", F.lit(False)).alias("f_rep"),
            F.coalesce("f_clf", F.lit(False)).alias("f_clf"),
        )
    )


def _funnel_counts(staged: DataFrame) -> DataFrame:
    """ONE wide combinable aggregate (n0..n5, t0..t5) over a frame with
    the flag columns plus s4/s5 — adding a stage costs two agg columns,
    not a pass."""
    conds = [
        F.lit(True),
        F.col("f_lang"),
        F.col("f_lang") & F.col("f_lm"),
        F.col("f_lang") & F.col("f_lm") & F.col("f_rep"),
        F.col("s4"),
        F.col("s5"),
    ]
    aggs = []
    for i, c in enumerate(conds):
        # COALESCE: sum over an empty corpus is NULL; the funnel's empty
        # stages are 0 on both engines (empty-corpus contract)
        aggs.append(
            F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0))
            .cast("bigint").alias(f"n{i}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(c, F.col("est_tokens")).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"t{i}")
        )
    return staged.agg(*aggs)


def _funnel_stack(funnel: DataFrame) -> DataFrame:
    """Wide one-row funnel → the 6-row (stage, stage_name, n_docs,
    n_tokens) long format the oracle emits."""
    stack_args = ", ".join(
        f"{i}, '{nm}', n{i}, t{i}" for i, nm in enumerate(_FUNNEL_STAGES)
    )
    return funnel.select(
        F.expr(
            f"stack({len(_FUNNEL_STAGES)}, {stack_args}) AS "
            "(stage, stage_name, n_docs, n_tokens)"
        )
    ).select(
        F.col("stage").cast("int").alias("stage"),
        "stage_name",
        "n_docs",
        "n_tokens",
    )


def _register_q218() -> None:
    from spark_state_provider_spark.operators.registry import get as _get
    from spark_state_provider_spark.operators.text import (
        LANG_MARKERS,
        _count_sql,
    )

    cluster_oracle = _get("q28e_dedup_clusters").oracle

    langs = sorted(LANG_MARKERS)
    lang_scores = ", ".join(
        f"CAST({' + '.join(_count_sql('p', m) for m in LANG_MARKERS[lg])}"
        f" AS BIGINT) AS score_{lg}"
        for lg in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    lang_case = "CASE " + " ".join(
        f"WHEN score_{lg} = {greatest} THEN '{lg}'" for lg in langs
    ) + " END"

    stage_rows = "\n UNION ALL ".join(
        f"SELECT {i} AS stage, '{nm}' AS stage_name,"
        f" n{i} AS n_docs, t{i} AS n_tokens FROM funnel"
        for i, nm in enumerate(
            ("all", "lang_qa", "lm_filter", "repetition", "classifier",
             "dedup")
        )
    )

    @register(
        "q218_curation_pipeline",
        oracle=f"""
        WITH base AS (
            SELECT doc_id, text, lang,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
                   (' ' || text || ' ') AS p
            FROM documents
        ),
        lang_pred AS (
            SELECT doc_id, lang = {lang_case} AS f_lang
            FROM (SELECT doc_id, lang, {lang_scores} FROM base)
        ),
        tri AS (
            SELECT doc_id, t.tri
            FROM documents, unnest(list_transform(
                generate_series(1, length(text) - 2),
                i -> substr(text, i, 3)
            )) AS t(tri)
            WHERE length(text) >= 3
        ),
        model AS (SELECT tri, count(*) AS n FROM tri GROUP BY tri),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM model),
        lm AS (
            SELECT d.doc_id,
                   CAST(sum(m.n) AS BIGINT) * {_CUR_LM_K}
                       >= count(*) * max(t.total) AS f_lm
            FROM tri d JOIN model m USING (tri) CROSS JOIN tot t
            GROUP BY d.doc_id
        ),
        tok AS (
            SELECT doc_id, string_split(text, ' ') AS l FROM documents
            WHERE len(string_split(text, ' ')) >= 5
        ),
        grams AS (
            SELECT doc_id, g.g
            FROM tok, unnest(list_transform(
                generate_series(1, len(l) - 4),
                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' '
                     || l[i+3] || ' ' || l[i+4]
            )) AS g(g)
        ),
        rep AS (
            SELECT doc_id, max(c) <= {_CUR_REP_MAX} AS f_rep
            FROM (SELECT doc_id, g, count(*) AS c
                  FROM grams GROUP BY doc_id, g)
            GROUP BY doc_id
        ),
        wtok AS (
            SELECT doc_id, t.tok
            FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        ),
        clf AS (
            SELECT doc_id,
                   CAST(sum(((('0x' || substr(md5(tok), 1, 8))::BIGINT
                              % {_QC_BUCKETS}) * {_QC_MULT}) % 2001 - 1000)
                        AS BIGINT)
                       > -{_CUR_QC_MILLI} * count(*) AS f_clf
            FROM wtok GROUP BY doc_id
        ),
        labels AS ({cluster_oracle}),
        flags AS (
            SELECT b.doc_id, b.est_tokens,
                   coalesce(lp.f_lang, FALSE) AS f_lang,
                   coalesce(lm.f_lm, FALSE) AS f_lm,
                   coalesce(r.f_rep, FALSE) AS f_rep,
                   coalesce(c.f_clf, FALSE) AS f_clf,
                   l.cluster_id
            FROM base b
            LEFT JOIN lang_pred lp ON lp.doc_id = b.doc_id
            LEFT JOIN lm ON lm.doc_id = b.doc_id
            LEFT JOIN rep r ON r.doc_id = b.doc_id
            LEFT JOIN clf c ON c.doc_id = b.doc_id
            LEFT JOIN labels l ON l.doc_id = b.doc_id
        ),
        staged AS (
            SELECT *,
                   f_lang AND f_lm AND f_rep AND f_clf AS s4,
                   f_lang AND f_lm AND f_rep AND f_clf AND (
                       cluster_id IS NULL OR doc_id = min(
                           CASE WHEN f_lang AND f_lm AND f_rep AND f_clf
                                THEN doc_id END
                       ) OVER (PARTITION BY coalesce(cluster_id, -doc_id))
                   ) AS s5
            FROM flags
        ),
        funnel AS (
            SELECT
                CAST(count(*) AS BIGINT) AS n0,
                CAST(coalesce(sum(est_tokens), 0) AS BIGINT) AS t0,
                CAST(count(*) FILTER (f_lang) AS BIGINT) AS n1,
                CAST(coalesce(sum(est_tokens) FILTER (f_lang), 0)
                     AS BIGINT) AS t1,
                CAST(count(*) FILTER (f_lang AND f_lm) AS BIGINT) AS n2,
                CAST(coalesce(sum(est_tokens) FILTER (f_lang AND f_lm), 0)
                     AS BIGINT) AS t2,
                CAST(count(*) FILTER (f_lang AND f_lm AND f_rep)
                     AS BIGINT) AS n3,
                CAST(coalesce(
                     sum(est_tokens) FILTER (f_lang AND f_lm AND f_rep), 0)
                     AS BIGINT) AS t3,
                CAST(count(*) FILTER (s4) AS BIGINT) AS n4,
                CAST(coalesce(sum(est_tokens) FILTER (s4), 0)
                     AS BIGINT) AS t4,
                CAST(count(*) FILTER (s5) AS BIGINT) AS n5,
                CAST(coalesce(sum(est_tokens) FILTER (s5), 0)
                     AS BIGINT) AS t5
            FROM staged
        )
        {stage_rows}
        """,
    )
    def q218_curation_pipeline(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Six-stage curation funnel chaining the round-5 gates: (stage,
        stage_name, n_docs, n_tokens) after each of — nothing, language
        QA (predicted == labeled, q198's predictor), corpus-LM filter
        (q188's score ≥ 1/{_CUR_LM_K}, cross-multiplied), repetition gate
        (q210's max span repeat ≤ {_CUR_REP_MAX}; <5-word docs fail),
        quality classifier (q187's logit > −{_CUR_QC_MILLI}·n_tokens
        milli), and near-dup dedup (survivor = lowest surviving doc_id of
        its q28e cluster; unclustered docs pass).

        Scale shape of the composed plan: the lang gate is pure column
        expressions on the scan; the LM and classifier gates are each
        explode → broadcast-model probe → map-side-combined per-doc agg
        (models are charset³- and {_QC_BUCKETS}-bounded); the repetition
        gate never leaves the document; the cluster index is the memoized
        corpus-snapshot materialization; the dedup window partitions by
        cluster (bounded by dup-family size). The funnel itself is ONE
        wide combinable aggregate + a constant 6-row stack — adding a
        stage costs two agg columns, not a pass.
        """
        from spark_state_provider_spark.operators.dedup import (
            _clusters_persisted,
        )

        from spark_state_provider_spark.operators.text import (
            _chartri_counts_persisted,
        )

        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        model, tot = _curation_lm_model(spark, sf_dir)
        labels = _clusters_persisted(spark, sf_dir)
        memo_dtc = _chartri_counts_persisted(spark, sf_dir).select(
            "doc_id", "tri", "c"
        )
        flags = _curation_flags(d, model, tot, dtc=memo_dtc).join(
            labels, "doc_id", "left"
        )
        s4 = (
            F.col("f_lang") & F.col("f_lm") & F.col("f_rep") & F.col("f_clf")
        )
        wc = Window.partitionBy(
            F.coalesce(F.col("cluster_id"), -F.col("doc_id"))
        )
        s5 = s4 & (
            F.col("cluster_id").isNull()
            | (
                F.col("doc_id")
                == F.min(F.when(s4, F.col("doc_id"))).over(wc)
            )
        )
        staged = flags.withColumn("s4", s4).withColumn("s5", s5)
        return _funnel_stack(_funnel_counts(staged))


_register_q218()


# ---------------------------------------------------------------------------
# q221 — DSIR-style hashed-bucket importance weighting for data selection.
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling", NeurIPS) select pretraining docs by an importance weight
# computed in a HASHED n-gram feature space: per-bucket rates under a
# target distribution vs the raw distribution, summed over the doc's
# tokens. The heavy lift at 100 TB is exactly two corpus passes: one
# bucket-count aggregate (tiny output: the feature table), one scoring
# pass that re-hashes tokens and accumulates per-doc weights.
#
# Determinism adaptation: DSIR's canonical weight is Σ log(p_t/p_r) —
# log() is banned for cross-engine float determinism (q154's rule), so
# the per-bucket score is the CENTERED LIKELIHOOD RATIO r−1 (the
# first-order Taylor expansion of ln r at r=1), fixed-point-quantized to
# an integer micro-score: sign and per-bucket ordering agree with the
# log form, and the per-doc accumulation becomes an exact BIGINT sum
# (no float summation order anywhere). Smoothing is add-one per bucket.
#
# Features are WORD BIGRAMS, as in the paper: measured on the stock
# corpus, unigram buckets wash out (languages share the body vocabulary;
# top-25 en share 52% vs 38.6% base rate) while bigrams capture the
# lang-specific word ADJACENCIES and lift the selected slice to 80% en —
# a 2.1× enrichment, which is the operator actually doing its job.
# ---------------------------------------------------------------------------

_DSIR_B = 4096  # hashed feature width (the paper uses 10k; plan identical)
_DSIR_TOP = 25
# s_b = floor(1e6 · (ct+1)/(cr+1) · (R+B)/(T+B)) − 1e6, centered so a
# bucket at target/raw parity contributes ~0. The textual expression is
# shared verbatim by both engines: IEEE double ·/÷ are correctly rounded,
# so identical operation order ⇒ identical doubles ⇒ identical floor.
_DSIR_SCORE = (
    "CAST(floor(1000000.0 * ((CAST(ct + 1 AS DOUBLE) / CAST(cr + 1 AS DOUBLE))"
    f" * (CAST(r_tot + {_DSIR_B} AS DOUBLE) / CAST(t_tot + {_DSIR_B} AS DOUBLE))))"
    " AS BIGINT) - 1000000"
)


@register(
    "q221_dsir_importance",
    oracle=f"""
    WITH tokl AS (
        SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents
    ),
    feat AS (
        SELECT doc_id, lang,
               (('0x' || substr(md5(t.bg), 1, 8))::BIGINT % {_DSIR_B})
                   AS bucket
        FROM tokl, unnest(list_transform(
            generate_series(1, len(l) - 1),
            i -> l[i] || ' ' || l[i+1]
        )) AS t(bg)
    ),
    db AS (
        SELECT doc_id, lang, bucket, CAST(count(*) AS BIGINT) AS n
        FROM feat GROUP BY doc_id, lang, bucket
    ),
    bc AS (
        SELECT bucket,
               CAST(sum(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS BIGINT)
                   AS ct,
               CAST(sum(n) AS BIGINT) AS cr
        FROM db GROUP BY bucket
    ),
    sc AS (
        SELECT bucket, {_DSIR_SCORE} AS s_micro
        FROM (
            SELECT bucket, ct, cr,
                   CAST(sum(ct) OVER () AS BIGINT) AS t_tot,
                   CAST(sum(cr) OVER () AS BIGINT) AS r_tot
            FROM bc
        )
    ),
    w AS (
        SELECT db.doc_id,
               db.lang,
               CAST(sum(db.n) AS BIGINT) AS n_grams,
               CAST(sum(db.n * sc.s_micro) AS BIGINT) AS dsir_micro
        FROM db JOIN sc USING (bucket)
        GROUP BY db.doc_id, db.lang
    )
    SELECT doc_id, lang, n_grams, dsir_micro,
           CAST(dsir_micro AS DOUBLE) / CAST(n_grams AS DOUBLE)
               AS micro_per_gram,
           rn
    FROM (
        SELECT *, row_number() OVER (
            ORDER BY dsir_micro DESC, doc_id) AS rn
        FROM w
    )
    WHERE rn <= {_DSIR_TOP}
    """,
)
def q221_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_DSIR_TOP} documents by DSIR-style hashed word-bigram
    importance weight against the lang='en' target slice.

    Scale shape: split once → bigram transform (a generator the optimizer
    will not re-evaluate, the q215 lesson) → portable md5 bucket (q187's
    pattern) → groupBy(doc, bucket) with map-side combine collapses
    occurrences BEFORE any join; the {_DSIR_B}-row feature table (target
    and raw counts + centered ratio micro-scores) BROADCASTS back onto
    the collapsed per-doc bucket rows; per-doc weights are one combinable
    BIGINT aggregate. The global top-k is TakeOrderedAndProject (partial
    per-partition top-k, {_DSIR_TOP} rows to the driver — never a full
    sort). Two corpus passes total, exactly DSIR's production cost.
    Single-token docs have no bigram and drop out of the ranking (both
    engines agree: empty transform list ↔ empty generate_series).
    """
    d = load_table(spark, sf_dir, "documents")
    tokl = d.select("doc_id", "lang", F.split("text", " ").alias("l"))
    feat = tokl.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.slice(F.col("l"), 1, F.size("l") - 1),
                lambda x, i: F.concat_ws(
                    " ", x, F.element_at(F.col("l"), i + 2)
                ),
            )
        ).alias("bg"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("bg"), 1, 8), 16, 10).cast("long")
            % _DSIR_B
        ).alias("bucket"),
    )
    db = feat.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").alias("n")
    )
    bc = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == "en", F.col("n")).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum("n").cast("long").alias("cr"),
    )
    # Totals via a window over the ≤{B}-row bucket frame instead of a
    # separate global aggregate: a second `bc.agg(...)` branch makes
    # Catalyst replay bc's WHOLE lineage (no common-subplan reuse), i.e.
    # a third full corpus scan — measured in the executed plan. The
    # unpartitioned window touches only the bounded bucket counts
    # (plan-audit allowlisted), keeping the query at exactly two corpus
    # passes.
    wall = Window.partitionBy()
    sc = bc.select(
        "bucket",
        "ct",
        "cr",
        F.sum("ct").over(wall).cast("long").alias("t_tot"),
        F.sum("cr").over(wall).cast("long").alias("r_tot"),
    ).select("bucket", F.expr(_DSIR_SCORE).alias("s_micro"))
    w = (
        db.join(F.broadcast(sc), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n").cast("long").alias("n_grams"),
            F.sum(F.col("n") * F.col("s_micro")).cast("long").alias(
                "dsir_micro"
            ),
        )
    )
    top = w.orderBy(F.col("dsir_micro").desc(), "doc_id").limit(_DSIR_TOP)
    win = Window.orderBy(F.col("dsir_micro").desc(), "doc_id")
    return top.withColumn("rn", F.row_number().over(win)).select(
        "doc_id",
        "lang",
        "n_grams",
        "dsir_micro",
        (
            F.col("dsir_micro").cast("double")
            / F.col("n_grams").cast("double")
        ).alias("micro_per_gram"),
        "rn",
    )


# ---------------------------------------------------------------------------
# q227 — packing-aware contamination: q46 (benchmark n-gram overlap) ×
# q38 (sequence packing). Concat-and-split packing slices the token
# stream every PACK_BUDGET tokens, so a contaminated trigram whose
# absolute offset straddles a pack boundary is INVISIBLE to any
# pack-at-a-time decontamination scan — the exact blind spot this query
# censuses. Packing here uses exact whitespace token counts (not q38's
# chars/4 estimate) so trigram offsets and pack offsets live in the same
# coordinate system.
# ---------------------------------------------------------------------------


@register(
    "q227_packing_contamination",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS hkey,
               string_split(text, ' ') AS l,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents
    ),
    layout AS (
        SELECT doc_id, bucket,
               sum(dl) OVER (
                   PARTITION BY bucket ORDER BY hkey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - dl AS start_off
        FROM tok
    ),
    bench AS (
        SELECT DISTINCT t.tri
        FROM tok, unnest(list_transform(
            generate_series(1, len(l) - 2),
            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]
        )) AS t(tri)
        WHERE doc_id % 97 = 0 AND dl >= 3
    ),
    occ AS (
        SELECT tok.doc_id, tok.bucket, t.i,
               t.l[t.i] || ' ' || t.l[t.i+1] || ' ' || t.l[t.i+2] AS tri
        FROM (SELECT doc_id, bucket, l, dl FROM tok) tok,
             LATERAL (
                 SELECT i, tok.l AS l
                 FROM unnest(generate_series(1, tok.dl - 2)) AS u(i)
             ) t
        WHERE tok.doc_id % 97 <> 0 AND tok.dl >= 3
    ),
    hit AS (
        SELECT o.bucket,
               CAST(floor((y.start_off + o.i - 1) / {PACK_BUDGET}.0)
                    AS BIGINT) AS pack_id,
               CASE WHEN floor((y.start_off + o.i - 1) / {PACK_BUDGET}.0)
                      <> floor((y.start_off + o.i + 1) / {PACK_BUDGET}.0)
                    THEN 1 ELSE 0 END AS straddles
        FROM occ o
        JOIN bench USING (tri)
        JOIN layout y ON y.doc_id = o.doc_id
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_contam_occ,
           CAST(sum(straddles) AS BIGINT) AS n_straddling,
           CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs_touched
    FROM hit
    GROUP BY bucket
    """,
)
def q227_packing_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per packing bucket: benchmark-trigram occurrences in the packed
    token stream, how many STRADDLE a {PACK_BUDGET}-token pack boundary
    (undetectable by pack-level scanning after the split), and how many
    packs carry contamination at all.

    Scale shape: the benchmark trigram set BROADCASTS (q46's rule — the
    benchmark is KBs against a 100 TB corpus); corpus trigrams with
    positions are a narrow posexplode feeding a hash probe, so only
    MATCHING occurrences (bounded by benchmark size) reach the layout
    join. The pack layout itself is q38's plan — one window per hash
    bucket, buckets independent, so parallelism scales with the bucket
    count. The final census is one combinable groupBy over ≤16 buckets.
    """
    tok = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.split("text", " ").alias("l"),
        F.size(F.split("text", " ")).cast("long").alias("dl"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    layout = tok.select(
        "doc_id",
        (F.sum("dl").over(w) - F.col("dl")).alias("start_off"),
    )
    tri_expr = F.expr(
        "transform(sequence(1, size(l) - 2), "
        "i -> struct(i AS i, concat_ws(' ', l[i-1], l[i], l[i+1]) AS tri))"
    )
    bench = (
        tok.where((F.col("doc_id") % 97 == 0) & (F.col("dl") >= 3))
        .select(F.explode(tri_expr).alias("x"))
        .select(F.col("x.tri").alias("tri"))
        .distinct()
    )
    occ = (
        tok.where((F.col("doc_id") % 97 != 0) & (F.col("dl") >= 3))
        .select("doc_id", "bucket", F.explode(tri_expr).alias("x"))
        .select("doc_id", "bucket", F.col("x.i").alias("i"), F.col("x.tri").alias("tri"))
    )
    abs_start = F.col("start_off") + F.col("i") - 1
    abs_end = F.col("start_off") + F.col("i") + 1
    hit = (
        occ.join(F.broadcast(bench), "tri")
        .join(layout, "doc_id")
        .select(
            "bucket",
            F.floor(abs_start / float(PACK_BUDGET)).cast("long").alias("pack_id"),
            (
                F.floor(abs_start / float(PACK_BUDGET))
                != F.floor(abs_end / float(PACK_BUDGET))
            ).cast("int").alias("straddles"),
        )
    )
    return hit.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_contam_occ"),
        F.sum("straddles").cast("long").alias("n_straddling"),
        F.count_distinct("pack_id").cast("long").alias("n_packs_touched"),
    )


# ---------------------------------------------------------------------------
# q232 — dedup-impact report: how much of the corpus each dedup family
# would remove, in one table. The number every curation run publishes
# before committing a rewrite: docs / chars / whitespace-tokens removed by
# exact dedup (q28's keep-min-id groups), near-dup clustering (q28b→q28e
# connected components, keep-min-id), substring span removal (q231's
# partial cuts), and semantic dedup (q112's SemDeDup verdicts, embeddings
# id-aligned with documents: vec_id == doc_id by testdata convention).
# Families are reported INDEPENDENTLY — each is the impact of running that
# family alone on the original corpus (the paper-style ablation view), not
# a sequential funnel (q218/q220 own the composed-funnel semantics).
# ---------------------------------------------------------------------------


def _register_q232() -> None:
    from spark_state_provider_spark.operators.dedup import (
        _clusters_persisted,
        q231_span_removal_rewrite,
    )
    from spark_state_provider_spark.operators.registry import _REGISTRY as _R

    clusters_sql = _R["q28e_dedup_clusters"].oracle
    semdedup_sql = _R["q112_semdedup"].oracle
    rewrite_sql = _R["q231_span_removal_rewrite"].oracle

    @register(
        "q232_dedup_impact_report",
        oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   length(text) AS n_ch,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents
        ),
        exact_rm AS (
            -- NULL-text docs are excluded by CHOICE (round-8 ADVICE):
            -- window partitioning groups NULLs together in both engines,
            -- so without the filter two NULL-text docs would count each
            -- other as "exact duplicates" while contributing 0 chars.
            SELECT doc_id FROM (
                SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keep
                FROM documents WHERE text IS NOT NULL
            ) WHERE doc_id <> keep
        ),
        near_rm AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY cluster_id) AS keep
                FROM ({clusters_sql}) c
            ) WHERE doc_id <> keep
        ),
        sem_rm AS (
            SELECT vec_id AS doc_id FROM ({semdedup_sql}) WHERE dropped
        ),
        sub AS (
            SELECT doc_id, cleaned_text, removed_chars
            FROM ({rewrite_sql})
        )
        SELECT 'exact' AS family,
               CAST(count(*) AS BIGINT) AS docs_affected,
               CAST(COALESCE(sum(t.n_ch), 0) AS BIGINT) AS chars_removed,
               CAST(COALESCE(sum(t.n_tok), 0) AS BIGINT) AS tokens_removed
        FROM exact_rm JOIN tok t USING (doc_id)
        UNION ALL
        SELECT 'near',
               CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(t.n_ch), 0) AS BIGINT),
               CAST(COALESCE(sum(t.n_tok), 0) AS BIGINT)
        FROM near_rm JOIN tok t USING (doc_id)
        UNION ALL
        SELECT 'substring',
               CAST(COALESCE(sum(CASE WHEN s.removed_chars > 0
                                      THEN 1 END), 0) AS BIGINT),
               CAST(COALESCE(sum(s.removed_chars), 0) AS BIGINT),
               CAST(COALESCE(sum(CASE WHEN s.removed_chars > 0
                        THEN t.n_tok
                             - len(string_split(s.cleaned_text, ' '))
                        END), 0) AS BIGINT)
        FROM sub s JOIN tok t USING (doc_id)
        UNION ALL
        SELECT 'semantic',
               CAST(count(*) AS BIGINT),
               CAST(COALESCE(sum(t.n_ch), 0) AS BIGINT),
               CAST(COALESCE(sum(t.n_tok), 0) AS BIGINT)
        FROM sem_rm JOIN tok t USING (doc_id)
        """,
        fuzz=("text",),
    )
    def q232_dedup_impact_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per dedup family (exact / near / substring / semantic): docs
        affected, chars removed, whitespace-tokens removed — each family
        measured independently against the original corpus. Substring is
        a PARTIAL removal (token delta = tokens(text) − tokens(cleaned));
        the other three remove whole docs (keep-min-id per exact-text
        group / near-dup cluster; q112's dropped verdict with vec_id ==
        doc_id). NULL-text docs count in docs_affected but contribute no
        chars/tokens (both engines' sums skip NULL).

        Scale shape: pure composition — every family input is a query
        this engine already runs at scale (hash groupBy, LSH bucket join
        + CC, df-capped anchor join, cluster-local SemDeDup); the report
        adds four doc_id equijoins against a 2-column width table and
        four global one-row aggregates. Nothing here is a new shuffle
        shape; at 100 TB you'd materialize the family verdicts once and
        point all downstream reports at them.
        """
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        tok = docs.select(
            "doc_id",
            F.length("text").alias("n_ch"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )

        def removed_by_window(df: DataFrame, part_col: str) -> DataFrame:
            w = Window.partitionBy(part_col)
            return (
                df.withColumn("keep", F.min("doc_id").over(w))
                .where(F.col("doc_id") != F.col("keep"))
                .select("doc_id")
            )

        # exact family: NULL-text docs are not duplicates of each other —
        # filter before the window (both engines; see oracle comment)
        exact_rm = removed_by_window(
            docs.where(F.col("text").isNotNull()), "text"
        )
        near_rm = removed_by_window(
            _clusters_persisted(spark, sf_dir), "cluster_id"
        )
        sem_rm = (
            _R["q112_semdedup"]
            .fn(spark, sf_dir)
            .where(F.col("dropped"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        sub = q231_span_removal_rewrite(spark, sf_dir)

        zero = F.lit(0).cast("long")

        def whole_doc_row(name: str, rm: DataFrame) -> DataFrame:
            return rm.join(tok, "doc_id").agg(
                F.count("*").cast("long").alias("docs_affected"),
                F.coalesce(F.sum("n_ch"), zero)
                .cast("long")
                .alias("chars_removed"),
                F.coalesce(F.sum("n_tok"), zero)
                .cast("long")
                .alias("tokens_removed"),
            ).select(
                F.lit(name).alias("family"),
                "docs_affected",
                "chars_removed",
                "tokens_removed",
            )

        affected = F.col("removed_chars") > 0
        sub_row = (
            sub.join(tok, "doc_id")
            .agg(
                F.coalesce(F.sum(F.when(affected, 1)), zero)
                .cast("long")
                .alias("docs_affected"),
                F.coalesce(F.sum("removed_chars"), zero)
                .cast("long")
                .alias("chars_removed"),
                F.coalesce(
                    F.sum(
                        F.when(
                            affected,
                            F.col("n_tok")
                            - F.size(F.split("cleaned_text", " ")),
                        )
                    ),
                    zero,
                )
                .cast("long")
                .alias("tokens_removed"),
            )
            .select(
                F.lit("substring").alias("family"),
                "docs_affected",
                "chars_removed",
                "tokens_removed",
            )
        )

        return (
            whole_doc_row("exact", exact_rm)
            .unionByName(whole_doc_row("near", near_rm))
            .unionByName(sub_row)
            .unionByName(whole_doc_row("semantic", sem_rm))
        )


_register_q232()


# ---------------------------------------------------------------------------
# q234 — benchmark DECONTAMINATION rewrite: the output side of q46. The
# GPT-3 decontamination procedure (Brown et al. 2020, Appendix C) removes
# the colliding n-gram occurrences from training documents rather than
# reporting them; here every corpus token position covered by a word
# trigram that also occurs in any benchmark doc (doc_id % 97 == 0, q46's
# convention) is cut, and the doc is reassembled from the surviving
# tokens. q46 stays the doc-level REPORT (with its ≥-shared gate); q234
# is the span-level surgery that removes every collision unconditionally.
# ---------------------------------------------------------------------------



_TRI_POS_EXPR = (
    # IF-guard, not greatest(...): sequence(1, 0) DESCENDS in Spark
    # ([1, 0]) and would emit bogus positions for docs with < 3 tokens
    # (found by the round-8 multibyte/short-doc fuzz corpora)
    "transform(IF(size(l) >= 3, sequence(1, size(l) - 2), array()), "
    "j -> struct(j AS j, concat_ws(' ', element_at(l, j), "
    "element_at(l, j + 1), element_at(l, j + 2)) AS tri))"
)

_TOKEN_REBUILD_EXPR = (
    "aggregate(ivs, "
    "struct(CAST(array() AS ARRAY<STRING>) AS a, CAST(1 AS INT) AS c), "
    "(acc, iv) -> struct("
    "  IF(iv.s > acc.c, concat(acc.a, slice(l, acc.c, iv.s - acc.c)), acc.a), "
    "  CAST(iv.e + 1 AS INT)), "
    "acc -> array_join("
    "  IF(size(l) >= acc.c, concat(acc.a, slice(l, acc.c, size(l) - acc.c + 1)), acc.a), "
    "  ' '))"
)


def benchmark_trigrams(docs: DataFrame) -> DataFrame:
    """DISTINCT word trigrams of the benchmark slice — the broadcast
    probe side of q234/q236."""
    return (
        docs.select(F.split("text", " ").alias("l"))
        .select(
            F.explode(
                F.expr(
                    "transform(IF(size(l) >= 3, sequence(1, size(l) - 2), "
                    "array()), "
                    "i -> concat_ws(' ', element_at(l, i), "
                    "element_at(l, i + 1), element_at(l, i + 2)))"
                )
            ).alias("tri")
        )
        .distinct()
    )


def decontaminate(corpus: DataFrame, bt: DataFrame) -> DataFrame:
    """Cut every token position of ``corpus`` (doc_id, text) covered by a
    trigram in ``bt`` and reassemble each doc from the surviving tokens —
    the shared surgery behind q234 (batch) and q236 (per micro-batch).
    Emits (doc_id, cleaned_text, removed_tokens) for EVERY corpus doc."""
    from spark_state_provider_spark.operators.dedup import (
        _merged_removal_intervals,
    )

    tok = corpus.select("doc_id", F.split("text", " ").alias("l"))
    hits = (
        tok.select(
            "doc_id",
            F.explode(F.expr(_TRI_POS_EXPR)).alias("x"),
        )
        .select("doc_id", F.col("x.j").alias("j"), F.col("x.tri").alias("tri"))
        .join(F.broadcast(bt), "tri")
        .select("doc_id", F.col("j").alias("s"), (F.col("j") + 2).alias("e"))
    )
    merged = _merged_removal_intervals(hits)
    iv = merged.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("s").cast("int").alias("s"),
                    F.col("e").cast("int").alias("e"),
                )
            )
        ).alias("ivs"),
        F.sum(F.col("e") - F.col("s") + 1)
        .cast("long")
        .alias("removed_tokens"),
    )
    return (
        corpus.join(iv, "doc_id", "left")
        .withColumn("l", F.split("text", " "))
        .select(
            "doc_id",
            F.when(F.col("ivs").isNotNull(), F.expr(_TOKEN_REBUILD_EXPR))
            .otherwise(F.col("text"))
            .alias("cleaned_text"),
            F.coalesce(F.col("removed_tokens"), F.lit(0).cast("long"))
            .alias("removed_tokens"),
        )
    )


def _register_q234() -> None:
    from spark_state_provider_spark.operators.dedup import _MERGE_CTES

    @register(
        "q234_decontamination_rewrite",
        oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS l
            FROM documents WHERE doc_id % 97 <> 0
        ),
        bt AS (
            SELECT DISTINCT b.l[i] || ' ' || b.l[i+1] || ' ' || b.l[i+2]
                       AS tri
            FROM (SELECT string_split(text, ' ') AS l FROM documents
                  WHERE doc_id % 97 = 0) b,
                 unnest(generate_series(1, len(b.l) - 2)) AS t(i)
        ),
        spans AS (
            SELECT p.doc_id, p.j AS s, p.j + 2 AS e
            FROM (
                SELECT tok.doc_id, u.j,
                       l[u.j] || ' ' || l[u.j+1] || ' ' || l[u.j+2] AS tri
                FROM tok, unnest(generate_series(1, len(l) - 2)) AS u(j)
            ) p JOIN bt USING (tri)
        ),
        {_MERGE_CTES},
        kept AS (
            -- positions materialized in a subquery first: DuckDB cannot
            -- LEFT JOIN against a column correlated with a lateral unnest
            SELECT q.doc_id,
                   string_agg(q.tokval, ' ' ORDER BY q.j) AS cleaned_text
            FROM (
                SELECT t.doc_id, p.j, t.l[p.j] AS tokval
                FROM tok t,
                     unnest(generate_series(1, len(t.l))) AS p(j)
            ) q
            LEFT JOIN merged m
                   ON m.doc_id = q.doc_id AND q.j BETWEEN m.s AND m.e
            WHERE m.doc_id IS NULL
            GROUP BY q.doc_id
        ),
        rm AS (
            SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS removed_tokens
            FROM merged GROUP BY doc_id
        )
        SELECT d.doc_id,
               CASE WHEN rm.removed_tokens IS NULL THEN d.text
                    ELSE COALESCE(k.cleaned_text, '') END AS cleaned_text,
               COALESCE(rm.removed_tokens, CAST(0 AS BIGINT))
                   AS removed_tokens
        FROM documents d
        LEFT JOIN kept k USING (doc_id)
        LEFT JOIN rm USING (doc_id)
        WHERE d.doc_id % 97 <> 0
        """,
        fuzz=("text", "multibyte"),
    )
    def q234_decontamination_rewrite(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per corpus doc (non-benchmark): text with every token position
        covered by a benchmark-colliding word trigram removed, plus the
        count of tokens cut — (doc_id, cleaned_text, removed_tokens),
        untouched docs pass through (NULL text stays NULL). The q231
        interval surgery transplanted to TOKEN space.

        Scale shape: the benchmark trigram set BROADCASTS (benchmark
        suites are KBs against a 100 TB corpus), so contamination
        detection is a narrow scan + hash probe — no corpus shuffle; the
        shuffled volume is only the HITS (bounded by benchmark size).
        Interval merge is per-doc gaps-and-islands over those hits; the
        rebuild is one JVM aggregate fold over the doc's token array
        slicing around the merged intervals — no per-token explode on
        the rebuild path, no Python anywhere.
        """
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        return decontaminate(
            docs.where(F.col("doc_id") % 97 != 0),
            benchmark_trigrams(docs.where(F.col("doc_id") % 97 == 0)),
        )


_register_q234()


# ---------------------------------------------------------------------------
# q239 — incremental decontamination across corpus snapshots (round-9
# verdict #6b). A re-crawl lands as snapshot v2 (q105's diff convention:
# doc_id % 131 removed, % 89 upper-cased, % 83 re-added at +1e6); the
# rewrite LEDGER carries v1's per-doc surgery verdicts forward, so only
# ADDED/MODIFIED docs re-run token surgery — the output side's analog of
# q78/q92's incremental detection. The oracle recomputes v2 from scratch;
# hash-equality proves incremental ≡ full recompute.
# ---------------------------------------------------------------------------


def _register_q239() -> None:
    from spark_state_provider_spark.operators.dedup import _MERGE_CTES

    # v2 corpus (non-benchmark docs only), shared by both dialects:
    # remove % 131, upper-case % 89, re-add % 83 under doc_id + 1e6
    _V2 = """
        SELECT doc_id,
               CASE WHEN doc_id % 89 = 0 THEN upper(text) ELSE text END
                   AS text
        FROM documents
        WHERE doc_id % 131 <> 0 AND doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents
        WHERE doc_id % 83 = 0 AND (doc_id + 1000000) % 97 <> 0
    """

    @register(
        "q239_incremental_decontamination",
        oracle=f"""
        WITH v2 AS ({_V2}),
        v1 AS (
            SELECT doc_id, md5(text) AS h FROM documents
            WHERE doc_id % 97 <> 0
        ),
        bt AS (
            SELECT DISTINCT b.l[i] || ' ' || b.l[i+1] || ' ' || b.l[i+2]
                       AS tri
            FROM (SELECT string_split(text, ' ') AS l FROM documents
                  WHERE doc_id % 97 = 0) b,
                 unnest(generate_series(1, len(b.l) - 2)) AS t(i)
        ),
        tok AS (SELECT doc_id, string_split(text, ' ') AS l FROM v2),
        spans AS (
            SELECT p.doc_id, p.j AS s, p.j + 2 AS e
            FROM (
                SELECT tok.doc_id, u.j,
                       l[u.j] || ' ' || l[u.j+1] || ' ' || l[u.j+2] AS tri
                FROM tok, unnest(generate_series(1, len(l) - 2)) AS u(j)
            ) p JOIN bt USING (tri)
        ),
        {_MERGE_CTES},
        kept AS (
            SELECT q.doc_id,
                   string_agg(q.tokval, ' ' ORDER BY q.j) AS cleaned_text
            FROM (
                SELECT t.doc_id, p.j, t.l[p.j] AS tokval
                FROM tok t,
                     unnest(generate_series(1, len(t.l))) AS p(j)
            ) q
            LEFT JOIN merged m
                   ON m.doc_id = q.doc_id AND q.j BETWEEN m.s AND m.e
            WHERE m.doc_id IS NULL
            GROUP BY q.doc_id
        ),
        rm AS (
            SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS removed_tokens
            FROM merged GROUP BY doc_id
        )
        SELECT d.doc_id,
               CASE WHEN rm.removed_tokens IS NULL THEN d.text
                    ELSE COALESCE(k.cleaned_text, '') END AS cleaned_text,
               COALESCE(rm.removed_tokens, CAST(0 AS BIGINT))
                   AS removed_tokens,
               CASE WHEN v1.h IS NOT NULL AND v1.h = md5(d.text)
                    THEN 'reused' ELSE 'recomputed' END AS surgery
        FROM v2 d
        LEFT JOIN v1 USING (doc_id)
        LEFT JOIN kept k USING (doc_id)
        LEFT JOIN rm USING (doc_id)
        """,
        fuzz=("text", "multibyte"),
    )
    def q239_incremental_decontamination(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The v2 snapshot's decontamination ledger, computed
        INCREMENTALLY: docs whose (doc_id, md5) survive from v1 reuse
        v1's surgery verdict untouched; only added/modified docs run the
        q234 token surgery — (doc_id, cleaned_text, removed_tokens,
        surgery ∈ {{'reused','recomputed'}}). The oracle recomputes v2
        from scratch, so the hash match proves the incremental plan is
        output-equivalent to a full re-run.

        Scale shape: the v1↔v2 reconciliation is q105's (doc_id, md5)
        equijoin — scan-stage hashes, no text bodies shuffle; the
        benchmark trigram set broadcasts as in q234; surgery cost is
        proportional to the CHANGED slice (adds + modifications), not
        the corpus — the property that makes re-crawl decontamination
        affordable when 99% of a 100 TB corpus is unchanged. The
        'reused' arm re-derives v1 verdicts here because the harness is
        single-snapshot; in production they are read back from the
        materialized v1 ledger, making the recompute slice the ONLY
        surgery cost.
        """
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        bt = benchmark_trigrams(docs.where(F.col("doc_id") % 97 == 0))
        v1 = docs.where(F.col("doc_id") % 97 != 0)
        v2 = (
            v1.where(F.col("doc_id") % 131 != 0)
            .select(
                "doc_id",
                F.when(F.col("doc_id") % 89 == 0, F.upper("text"))
                .otherwise(F.col("text"))
                .alias("text"),
            )
            .unionAll(
                docs.where(
                    (F.col("doc_id") % 83 == 0)
                    & ((F.col("doc_id") + 1_000_000) % 97 != 0)
                ).select(
                    (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
                )
            )
        )
        v1h = v1.select("doc_id", F.md5("text").alias("h1"))
        classified = v2.join(v1h, "doc_id", "left").withColumn(
            "reused",
            F.col("h1").isNotNull() & (F.col("h1") == F.md5("text")),
        )
        changed = classified.where(~F.col("reused")).select(
            "doc_id", "text"
        )
        unchanged = classified.where(F.col("reused")).select("doc_id")
        # v1 ledger verdicts (materialized-table stand-in), probed only
        # for the unchanged slice
        v1_ledger = decontaminate(v1, bt)
        reused_rows = v1_ledger.join(unchanged, "doc_id", "left_semi")
        recomputed_rows = decontaminate(changed, bt)
        return reused_rows.withColumn(
            "surgery", F.lit("reused")
        ).unionAll(
            recomputed_rows.withColumn("surgery", F.lit("recomputed"))
        )


_register_q239()


# ---------------------------------------------------------------------------
# q242 — combined contamination verdict: the two decontamination gates
# (q234 exact trigram, q238 semantic cosine) joined into one per-doc
# status — the table a pipeline operator actually pages through when a
# benchmark regression smells like leakage. verdict ∈ {both, exact,
# semantic, clean}; embeddings join documents on vec_id = doc_id (the
# q112/q232 convention).
# ---------------------------------------------------------------------------


def _register_q242() -> None:
    from spark_state_provider_spark.operators.registry import _REGISTRY

    exact_sql = _REGISTRY["q234_decontamination_rewrite"].oracle
    sem_sql = _REGISTRY["q238_semantic_contamination"].oracle

    @register(
        "q242_contamination_verdicts",
        oracle=f"""
        WITH ex AS (
            SELECT doc_id, removed_tokens FROM ({exact_sql})
        ),
        sem AS (
            SELECT vec_id AS doc_id, matched_benchmark, sim
            FROM ({sem_sql})
        )
        SELECT ex.doc_id,
               CAST(ex.removed_tokens AS BIGINT) AS exact_removed_tokens,
               CAST(sem.matched_benchmark AS BIGINT) AS matched_benchmark,
               sem.sim AS semantic_sim,
               CASE WHEN ex.removed_tokens > 0 AND sem.doc_id IS NOT NULL
                         THEN 'both'
                    WHEN ex.removed_tokens > 0 THEN 'exact'
                    WHEN sem.doc_id IS NOT NULL THEN 'semantic'
                    ELSE 'clean' END AS verdict
        FROM ex LEFT JOIN sem USING (doc_id)
        """,
        fuzz=("text", "embeddings"),
    )
    def q242_contamination_verdicts(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per corpus doc, both contamination gates in one row:
        (doc_id, exact_removed_tokens, matched_benchmark, semantic_sim,
        verdict ∈ {{both, exact, semantic, clean}}) — q234's surgery
        count joined with q238's best-benchmark flag on the shared
        vec_id = doc_id key.

        Scale shape: pure composition of two verified plans plus ONE
        doc_id equijoin; the semantic side is already bounded by its τ
        filter (flagged rows only), so the join's right side is tiny and
        broadcasts. Nothing new shuffles at corpus width beyond q234
        itself.
        """
        from spark_state_provider_spark.operators.registry import (
            _REGISTRY as _R,
        )

        ex = (
            _R["q234_decontamination_rewrite"]
            .fn(spark, sf_dir)
            .select("doc_id", "removed_tokens")
        )
        sem = (
            _R["q238_semantic_contamination"]
            .fn(spark, sf_dir)
            .select(
                F.col("vec_id").alias("doc_id"),
                "matched_benchmark",
                F.col("sim").alias("semantic_sim"),
            )
        )
        j = ex.join(F.broadcast(sem), "doc_id", "left")
        return j.select(
            "doc_id",
            F.col("removed_tokens")
            .cast("long")
            .alias("exact_removed_tokens"),
            F.col("matched_benchmark").cast("long").alias(
                "matched_benchmark"
            ),
            "semantic_sim",
            F.when(
                (F.col("removed_tokens") > 0)
                & F.col("matched_benchmark").isNotNull(),
                "both",
            )
            .when(F.col("removed_tokens") > 0, "exact")
            .when(F.col("matched_benchmark").isNotNull(), "semantic")
            .otherwise("clean")
            .alias("verdict"),
        )


_register_q242()


# ---------------------------------------------------------------------------
# q244 — benchmark leak leaderboard: attribution from the BENCHMARK side.
# q242 answers "is this corpus doc contaminated"; q244 answers "which
# benchmark item leaks most" — per benchmark doc, how many corpus docs
# collide with one of ITS trigrams (exact gate) and how many corpus
# vectors flag it as their best semantic match (q238's argmax). The
# number an eval owner reads before deciding which benchmark split to
# retire.
# ---------------------------------------------------------------------------


def _register_q244() -> None:
    from spark_state_provider_spark.operators.registry import _REGISTRY

    sem_sql = _REGISTRY["q238_semantic_contamination"].oracle

    @register(
        "q244_benchmark_leak_report",
        oracle=f"""
        WITH bsrc AS (
            SELECT DISTINCT b.doc_id AS bench_id,
                   b.l[i] || ' ' || b.l[i+1] || ' ' || b.l[i+2] AS tri
            FROM (SELECT doc_id, string_split(text, ' ') AS l
                  FROM documents WHERE doc_id % 97 = 0) b,
                 unnest(generate_series(1, len(b.l) - 2)) AS t(i)
        ),
        hits AS (
            SELECT DISTINCT p.doc_id, bsrc.bench_id
            FROM (
                SELECT c.doc_id,
                       l[u.j] || ' ' || l[u.j+1] || ' ' || l[u.j+2] AS tri
                FROM (SELECT doc_id, string_split(text, ' ') AS l
                      FROM documents WHERE doc_id % 97 <> 0) c,
                     unnest(generate_series(1, len(l) - 2)) AS u(j)
            ) p JOIN bsrc USING (tri)
        ),
        ex AS (
            SELECT bench_id,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_exact
            FROM hits GROUP BY bench_id
        ),
        sem AS (
            SELECT matched_benchmark AS bench_id,
                   CAST(count(*) AS BIGINT) AS n_docs_semantic
            FROM ({sem_sql}) GROUP BY matched_benchmark
        )
        SELECT b.doc_id AS bench_id,
               COALESCE(ex.n_docs_exact, CAST(0 AS BIGINT))
                   AS n_docs_exact,
               COALESCE(sem.n_docs_semantic, CAST(0 AS BIGINT))
                   AS n_docs_semantic
        FROM (SELECT doc_id FROM documents WHERE doc_id % 97 = 0) b
        LEFT JOIN ex ON ex.bench_id = b.doc_id
        LEFT JOIN sem ON sem.bench_id = b.doc_id
        """,
        fuzz=("text", "embeddings"),
    )
    def q244_benchmark_leak_report(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per benchmark DOC (doc_id % 97 == 0): how many corpus docs
        share one of its word trigrams (n_docs_exact) and how many
        corpus vectors pick it as their best over-τ semantic match
        (n_docs_semantic, q238's argmax) — zero rows included, so the
        leaderboard doubles as a coverage audit. Anchored on benchmark
        DOCUMENT ids; a semantic match against a benchmark vector with
        no same-id document would not appear (the synthetic tables share
        the id space, and production benchmark suites key docs and
        embeddings identically).

        Scale shape: the per-benchmark trigram SOURCE table is the same
        KB-scale broadcast as q234's bt (bounded by the benchmark, one
        extra column); the corpus side is one narrow scan + hash probe,
        and the DISTINCT (doc_id, bench_id) frame is bounded by
        benchmark size × collision fan-out, never corpus². The semantic
        side is q238's already-τ-bounded output grouped once.
        """
        from spark_state_provider_spark.operators.registry import (
            _REGISTRY as _R,
        )

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        bench = docs.where(F.col("doc_id") % 97 == 0)
        corpus = docs.where(F.col("doc_id") % 97 != 0)

        def tri_pos(df: DataFrame, id_alias: str) -> DataFrame:
            return (
                df.select(
                    F.col("doc_id").alias(id_alias),
                    F.split("text", " ").alias("l"),
                )
                .select(
                    id_alias,
                    F.explode(F.expr(_TRI_POS_EXPR)).alias("x"),
                )
                .select(id_alias, F.col("x.tri").alias("tri"))
            )

        bsrc = tri_pos(bench, "bench_id").distinct()
        hits = (
            tri_pos(corpus, "doc_id")
            .join(F.broadcast(bsrc), "tri")
            .select("doc_id", "bench_id")
            .distinct()
        )
        ex = hits.groupBy("bench_id").agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs_exact")
        )
        sem = (
            _R["q238_semantic_contamination"]
            .fn(spark, sf_dir)
            .groupBy(F.col("matched_benchmark").alias("bench_id"))
            .agg(F.count("*").cast("long").alias("n_docs_semantic"))
        )
        zero = F.lit(0).cast("long")
        return (
            bench.select(F.col("doc_id").alias("bench_id"))
            .join(F.broadcast(ex), "bench_id", "left")
            .join(F.broadcast(sem), "bench_id", "left")
            .select(
                "bench_id",
                F.coalesce("n_docs_exact", zero).alias("n_docs_exact"),
                F.coalesce("n_docs_semantic", zero).alias(
                    "n_docs_semantic"
                ),
            )
        )


_register_q244()
