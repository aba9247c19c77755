"""Web-corpus curation operators beyond the dedup family: Gopher-style
quality rules, C4-style global line dedup, and per-domain caps.

These are the remaining standard stages of a large-scale training-data
pipeline (Rae et al. 2021 "Scaling Language Models" appendix A1.1; Raffel
et al. 2020 C4 §2.2; public Common-Crawl curation practice).  Shapes are
chosen for 100 TB:

  * ``gopher_quality`` — one narrow projection, all metrics as JVM array
    expressions except the top-bigram fraction, which is one explode +
    map-side-combinable groupBy (bigram count per doc, max per doc);
  * ``c4_line_dedup`` — global first-occurrence line dedup is one
    map-side-combinable groupBy(md5(line)) keeping the min (url, pos)
    struct; shuffle rows are fixed-width digests + one candidate per
    distinct line per input partition — no payload;
  * ``domain_cap`` — two-phase host counts (combinable groupBy +
    broadcast join) plus one rank window for the cap itself; the
    standard anti-bias cap on over-crawled domains.

Every operator has an exact DuckDB oracle restating the same computation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import pipeline, spec

# Gopher-rule bounds (A1.1, adapted to the synthetic corpus's 10-99-word
# docs: the word-count floor is 30 instead of 50 so the rule discriminates
# instead of rejecting everything)
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_TOP_BIGRAM = 0.20
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

C4_MIN_LINE_WORDS = 5   # C4 drops lines with < 5 words
C4_MIN_DOC_LINES = 3    # ...and docs left with < 3 lines
DOMAIN_CAP = 4          # max docs kept per registrable host


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# ------------------------------------------------------------------ gopher --

def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher quality metrics + keep flag.

    n_words / mean word length / stopword count are pure array expressions
    (no shuffle); the top-bigram character fraction needs one explode +
    groupBy(doc, bigram) + max — both aggs are map-side combinable, so the
    shuffle carries one row per distinct (doc, bigram)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    # single-spaced text: total word chars = length - (n-1) separators
    mean_wlen = F.round(
        (F.length("text") - n + F.lit(1)).cast("double") / n, 4
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    base = d.select(
        "doc_id",
        n.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        n_stop.alias("n_stopwords"),
        words.alias("w"),
    )
    # Guard the sequence: for a 0/1-word doc sequence(1, n-1) would emit a
    # DESCENDING [1, 0] range (DuckDB's generate_series(1, 0) is empty) and
    # element_at(w, 0) throws at runtime.  Short docs yield no bigrams on
    # both engines; explode() drops the empty arrays identically.
    bigram_arr = F.when(
        F.col("n_words") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.col("n_words") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("w", i), F.element_at("w", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = base.select("doc_id", F.explode(bigram_arr).alias("bigram"))
    top = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    out = base.join(top, "doc_id", "left").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len",
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        F.round(
            F.coalesce(F.col("top_c"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_words") - 1, F.lit(1)),
            4,
        ).alias("top_bigram_frac"),
    )
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WLEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WLEN)
        & (F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS)
        & (F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM)
    )
    return out.withColumn("keep", keep)


def gopher_quality_oracle() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n_words
  FROM documents
),
base AS (
  SELECT doc_id, n_words,
         ROUND((length(text) - n_words + 1)::DOUBLE / n_words, 4) AS mean_word_len,
         len(list_filter(w, x -> x IN ({stop}))) AS n_stopwords
  FROM d
),
bi AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, n_words - 1)) AS i
        FROM d)
),
top AS (
  SELECT doc_id, MAX(c) AS top_c FROM (
    SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY doc_id, bigram
  ) GROUP BY doc_id
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(b.n_words AS BIGINT) AS n_words,
       b.mean_word_len,
       CAST(b.n_stopwords AS BIGINT) AS n_stopwords,
       ROUND(COALESCE(t.top_c, 0)::DOUBLE / GREATEST(b.n_words - 1, 1), 4)
         AS top_bigram_frac,
       (b.n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND b.mean_word_len BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN}
        AND b.n_stopwords >= {GOPHER_MIN_STOPWORDS}
        AND ROUND(COALESCE(t.top_c, 0)::DOUBLE / GREATEST(b.n_words - 1, 1), 4)
            <= {GOPHER_MAX_TOP_BIGRAM}) AS keep
FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id
"""


# --------------------------------------------------------------------- c4 --

def c4_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning over the EXTRACTED html corpus: drop lines with
    < C4_MIN_LINE_WORDS words, dedup the remainder GLOBALLY keeping only
    the first occurrence (ordered by url, line position), reassemble docs
    and drop those left with < C4_MIN_DOC_LINES lines.

    Composes on the extraction pipeline output (the lines exist only after
    boilerplate strip), so this is the full extract→clean chain.  The
    global first-occurrence dedup is a ``groupBy(md5(line)).agg(min(
    struct(url, pos, line)))`` — NOT a row_number window: the aggregate is
    map-side combinable (partial min before the exchange), so at 100 TB
    each input partition ships at most one candidate row per distinct
    line, keyed by the fixed-width 32-char digest rather than the full
    line text.  min over the (url, pos, line) struct is lexicographic on
    (url, pos) — identical to the window's ORDER BY url, pos — and the
    line rides along in the value so no join-back is needed."""
    from ..sources.pagesgen import load_or_build_pages

    pages = load_or_build_pages(spark, sf_dir).where(F.col("variant") == "html")
    docs = pipeline.doc_text(pipeline.extract_pages(pages)).select("url", "text")
    lines = docs.select(
        "url", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).where(F.size(F.split("line", " ")) >= C4_MIN_LINE_WORDS)
    firsts = (
        lines.groupBy(F.md5("line").alias("line_key"))
        .agg(F.min(F.struct("url", "pos", "line")).alias("k"))
        .select(F.col("k.url").alias("url"), F.col("k.pos").alias("pos"),
                F.col("k.line").alias("line"))
    )
    return (
        firsts.groupBy("url")
        .agg(
            F.count("*").alias("n_lines"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("text"),
        )
        .where(F.col("n_lines") >= C4_MIN_DOC_LINES)
        .select("url", F.col("n_lines").cast("long").alias("n_lines"), "text")
    )


def c4_line_dedup_oracle() -> str:
    return f"""
WITH g AS ({spec.html_golden_duckdb_sql(spec.SQL_IS_HTML).strip()}),
lines AS (
  SELECT url, i AS pos, ls[i] AS line
  FROM (SELECT url, string_split(text, chr(10)) AS ls,
               unnest(generate_series(1, len(string_split(text, chr(10))))) AS i
        FROM g)
),
kept AS (
  SELECT url, pos - 1 AS pos, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY url, pos) AS rk
  FROM lines
  WHERE len(string_split(line, ' ')) >= {C4_MIN_LINE_WORDS}
)
SELECT url, CAST(COUNT(*) AS BIGINT) AS n_lines,
       string_agg(line, chr(10) ORDER BY pos) AS text
FROM kept WHERE rk = 1
GROUP BY url HAVING COUNT(*) >= {C4_MIN_DOC_LINES}
"""


# ------------------------------------------------------------------ domain --

def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain doc caps: host from the url, rank docs within each host
    (deterministic: by url), keep <= DOMAIN_CAP — the standard remedy for
    over-crawled domains dominating a corpus.

    Skew-hardened two-phase shape: the per-host doc count is a map-side
    combinable ``groupBy(host).count()`` broadcast-joined back (one row
    per host — at crawl scale a mega-host contributes ONE partial count
    per input partition instead of funneling every row through one
    count-over-window task).  The rank itself needs the per-host sort
    window BECAUSE this diagnostic variant emits every doc's full rank;
    the production form that only needs the kept rows is
    ``domain_cap_salted`` below, where the mega-host sort is bounded."""
    d = _docs(spark, sf_dir).select(F.expr(spec.SQL_URL).alias("url"))
    host = F.expr("split_part(url, '/', 3)")
    docs = d.select("url", host.alias("host"))
    counts = docs.groupBy("host").agg(F.count("*").cast("long").alias("n_host_docs"))
    w = Window.partitionBy("host").orderBy("url")
    return (
        docs
        .withColumn("host_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(counts), "host")
        .withColumn("kept", F.col("host_rank") <= DOMAIN_CAP)
        .select("url", "host", "host_rank", "n_host_docs", "kept")
    )


def domain_cap_oracle() -> str:
    return f"""
WITH d AS (SELECT {spec.SQL_URL} AS url FROM documents)
SELECT url, split_part(url, '/', 3) AS host,
       CAST(ROW_NUMBER() OVER (PARTITION BY split_part(url, '/', 3)
                               ORDER BY url) AS BIGINT) AS host_rank,
       CAST(COUNT(*) OVER (PARTITION BY split_part(url, '/', 3)) AS BIGINT)
         AS n_host_docs,
       ROW_NUMBER() OVER (PARTITION BY split_part(url, '/', 3)
                          ORDER BY url) <= {DOMAIN_CAP} AS kept
FROM d
"""


DOMAIN_SALTS = 8


def domain_cap_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production domain cap at crawl scale: emit ONLY the kept rows
    (host_rank <= DOMAIN_CAP).

    The per-host sort is salted so no single task ever sorts a
    mega-host's full crawl: docs spread across (host, salt) buckets by
    url hash; each bucket pre-truncates to its own top-DOMAIN_CAP by
    url; only those <= DOMAIN_CAP * DOMAIN_SALTS survivors per host
    reach the final rank window.  Semantics-preserving because the
    global top-CAP by url is always a subset of the union of per-bucket
    top-CAPs (any globally-kept doc is within the top-CAP of its own
    bucket).  The full-corpus host counts still come from the combinable
    two-phase groupBy, not a window."""
    d = _docs(spark, sf_dir).select(F.expr(spec.SQL_URL).alias("url"))
    docs = d.select("url", F.expr("split_part(url, '/', 3)").alias("host"))
    counts = docs.groupBy("host").agg(
        F.count("*").cast("long").alias("n_host_docs")
    )
    salted = docs.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(DOMAIN_SALTS))
    )
    wsalt = Window.partitionBy("host", "salt").orderBy("url")
    pre = (
        salted.withColumn("srk", F.row_number().over(wsalt))
        .where(F.col("srk") <= DOMAIN_CAP)
        .drop("srk", "salt")
    )
    w = Window.partitionBy("host").orderBy("url")
    return (
        pre.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .where(F.col("host_rank") <= DOMAIN_CAP)
        .join(F.broadcast(counts), "host")
        .select("url", "host", "host_rank", "n_host_docs")
    )


def domain_cap_salted_oracle() -> str:
    return f"""
WITH d AS (SELECT {spec.SQL_URL} AS url FROM documents),
ranked AS (
  SELECT url, split_part(url, '/', 3) AS host,
         CAST(ROW_NUMBER() OVER (PARTITION BY split_part(url, '/', 3)
                                 ORDER BY url) AS BIGINT) AS host_rank,
         CAST(COUNT(*) OVER (PARTITION BY split_part(url, '/', 3)) AS BIGINT)
           AS n_host_docs
  FROM d
)
SELECT url, host, host_rank, n_host_docs
FROM ranked WHERE host_rank <= {DOMAIN_CAP}
"""


# --------------------------------------------------------------- url canon --

TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "ref=")


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL canonicalization, pure JVM expressions: lowercase
    scheme+authority, strip default ports (:443 https / :80 http), drop the
    fragment, remove tracking params (utm_*/gclid/fbclid/ref), sort the
    surviving query params, strip a trailing path slash.

    The fixture derives deliberately-messy variants from doc_id (mixed
    case, default ports, shuffled+tracking params, fragments) so the
    canonical form is closed-form for the oracle.  At 10^12 docs this is
    the map-side normalizer that makes exact URL dedup meaningful."""
    d = _docs(spark, sf_dir).select("doc_id")
    messy = F.expr(
        "concat('HTTPS://Host', CAST(doc_id % 97 AS STRING), '.Example:443/doc',"
        " CAST(doc_id AS STRING),"
        " CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=x&b=2&a=1#frag'"
        "      WHEN doc_id % 3 = 1 THEN '?a=1&utm_campaign=y'"
        "      ELSE '' END)"
    )
    raw = d.select("doc_id", messy.alias("url_raw"))
    scheme = F.lower(F.regexp_extract("url_raw", r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    authority = F.lower(F.regexp_extract("url_raw", r"^[^:]+://([^/?#]*)", 1))
    host = F.when(
        (scheme == "https") & authority.endswith(":443"),
        F.expr("substring(lower(regexp_extract(url_raw, '^[^:]+://([^/?#]*)', 1)), 1,"
               " length(regexp_extract(url_raw, '^[^:]+://([^/?#]*)', 1)) - 4)"),
    ).when(
        (scheme == "http") & authority.endswith(":80"),
        F.expr("substring(lower(regexp_extract(url_raw, '^[^:]+://([^/?#]*)', 1)), 1,"
               " length(regexp_extract(url_raw, '^[^:]+://([^/?#]*)', 1)) - 3)"),
    ).otherwise(authority)
    path = F.regexp_extract("url_raw", r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.expr("substring(regexp_extract(url_raw, '^[^:]+://[^/?#]*([^?#]*)', 1), 1,"
               " length(regexp_extract(url_raw, '^[^:]+://[^/?#]*([^?#]*)', 1)) - 1)"),
    ).otherwise(path)
    query = F.regexp_extract("url_raw", r"\?([^#]*)", 1)
    keep_pred = " AND ".join(
        f"NOT p LIKE '{pre}%'" for pre in TRACKING_PREFIXES
    )
    params = F.expr(
        "array_join(sort_array(filter(split(regexp_extract(url_raw, '\\\\?([^#]*)', 1), '&'),"
        f" p -> p != '' AND {keep_pred})), '&')"
    )
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )
    return raw.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "url_raw",
        canon.alias("url_canonical"),
    )


def url_canonicalize_oracle() -> str:
    keep_pred = " AND ".join(
        f"NOT p LIKE '{pre}%'" for pre in TRACKING_PREFIXES
    )
    return f"""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://Host' || CAST(doc_id % 97 AS STRING) || '.Example:443/doc'
         || CAST(doc_id AS STRING)
         || CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=x&b=2&a=1#frag'
                 WHEN doc_id % 3 = 1 THEN '?a=1&utm_campaign=y'
                 ELSE '' END AS url_raw
  FROM documents
),
parts AS (
  SELECT doc_id, url_raw,
         lower(regexp_extract(url_raw, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         lower(regexp_extract(url_raw, '^[^:]+://([^/?#]*)', 1)) AS authority,
         regexp_extract(url_raw, '^[^:]+://[^/?#]*([^?#]*)', 1) AS path0,
         regexp_extract(url_raw, '\\?([^#]*)', 1) AS query0
  FROM raw
),
norm AS (
  SELECT doc_id, url_raw, scheme,
         CASE WHEN scheme = 'https' AND authority LIKE '%:443'
              THEN substr(authority, 1, length(authority) - 4)
              WHEN scheme = 'http' AND authority LIKE '%:80'
              THEN substr(authority, 1, length(authority) - 3)
              ELSE authority END AS host,
         CASE WHEN length(path0) > 1 AND path0 LIKE '%/'
              THEN substr(path0, 1, length(path0) - 1)
              ELSE path0 END AS path,
         array_to_string(
           list_sort(list_filter(string_split(query0, '&'),
                                 p -> p != '' AND {keep_pred})), '&') AS params
  FROM parts
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, url_raw,
       scheme || '://' || host || path ||
       CASE WHEN params != '' THEN '?' || params ELSE '' END AS url_canonical
FROM norm
"""


# ----------------------------------------------------------- composed chain --

PIPE_MIN_TOKENS = 30


def web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed production chain in ONE Catalyst plan: HTML extraction
    (mapInPandas kernel) → C4 line filter + global line dedup → per-doc
    stats (token count, md5 fingerprint, keep flag).  Demonstrates that the
    curation stages pipeline without materialization barriers — Catalyst
    sees extraction output as just another relation."""
    cleaned = c4_line_dedup(spark, sf_dir)
    toks = F.size(F.split(F.regexp_replace("text", "\n", " "), " "))
    return cleaned.select(
        "url",
        "n_lines",
        toks.cast("long").alias("n_tokens"),
        F.md5(F.col("text")).alias("fingerprint"),
        (toks >= PIPE_MIN_TOKENS).alias("keep"),
    )


def web_pipeline_oracle() -> str:
    return f"""
WITH cleaned AS ({c4_line_dedup_oracle().strip()})
SELECT url, n_lines,
       CAST(len(string_split(replace(text, chr(10), ' '), ' ')) AS BIGINT)
         AS n_tokens,
       md5(text) AS fingerprint,
       len(string_split(replace(text, chr(10), ' '), ' ')) >= {PIPE_MIN_TOKENS}
         AS keep
FROM cleaned
"""


# ----------------------------------------------------------- crawl windows --

CRAWL_WINDOW = "1 hour"


def crawl_host_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-rate accounting over the input_hint table shape: docs and
    payload bytes per (host, 1-hour tumbling warc_ts window) — the stats a
    politeness scheduler and an ingest monitor read.  Pure JVM windowed
    agg on the pages table (url, warc_ts, html); the same shape runs as a
    Structured Streaming query with a watermark (streaming/windowed.py
    demonstrates the twin on events)."""
    from ..sources.pagesgen import load_or_build_pages

    pages = load_or_build_pages(spark, sf_dir).select(
        F.expr("split_part(url, '/', 3)").alias("host"),
        "warc_ts",
        F.length("html").alias("n_bytes"),
    )
    return (
        pages.groupBy(
            F.window("warc_ts", CRAWL_WINDOW).alias("w"), "host"
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("sum_bytes"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "host", "n_docs", "sum_bytes",
        )
    )


def crawl_host_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate projection: (win_start, host, n_docs) — payload byte sums stay
    in the operator but are not SQL-restatable closed-form (the builders
    decide them), so the oracle checks the windowed doc counts."""
    return crawl_host_windows(spark, sf_dir).select(
        "win_start", "host", "n_docs"
    )


def crawl_host_windows_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         'host' || CAST(doc_id % 97 AS STRING) || '.example' AS host,
         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(13 * doc_id) AS ts
  FROM documents
)
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
         AS win_start,
       host, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY 1, 2
"""


# -------------------------------------------------------- mixture sampling --

#: per-language inclusion percentages (training-mixture weights)
MIX_RATES = {"en": 90, "de": 60, "fr": 60, "es": 60, "zh": 30}
MIX_DEFAULT_RATE = 10


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the mixture-weighting step of a
    training-data pipeline: each language stratum keeps a fixed share of
    docs, chosen by a content-independent hash coin (Knuth multiplicative:
    doc_id * 2654435761 mod 2^32 mod 100 < rate) so the sample is
    reproducible, order-independent, and needs NO shuffle at all (pure
    map-side projection + filter — at 10^12 docs the sampler is free;
    only the kept rows flow on)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    rate = F.lit(MIX_DEFAULT_RATE)
    for lang, r in sorted(MIX_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    coin = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % 100
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        rate.cast("long").alias("rate_pct"),
        coin.alias("coin"),
        (coin < rate).alias("kept"),
    )


def mixture_sample_oracle() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {r}" for lang, r in sorted(MIX_RATES.items())
    )
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       CAST(CASE lang {whens} ELSE {MIX_DEFAULT_RATE} END AS BIGINT)
         AS rate_pct,
       CAST(doc_id * 2654435761 % 4294967296 % 100 AS BIGINT) AS coin,
       doc_id * 2654435761 % 4294967296 % 100
         < CASE lang {whens} ELSE {MIX_DEFAULT_RATE} END AS kept
FROM documents
"""


# ----------------------------------------------------------- shard packing --

SHARD_TOKENS = 2000  # target token budget per training shard


#: docs per cumsum bucket — stands in for range-partition boundaries; at
#: 10^12 docs you derive the boundaries from the table's doc_id range (or
#: reuse the layout's range partitioning) so each bucket is one task.
SHARD_BUCKET_DOCS = 1024

#: cap on the superbucket relation — the ONLY input to the non-equi
#: prefix join, so the BNLJ is at most (2^15)^2 long comparisons over a
#: ~1 MB broadcast regardless of corpus size.
SHARD_MAX_SUPERS = 1 << 15


def shard_super_factor(n_buckets: int) -> int:
    """Fine buckets per superbucket, derived from corpus stats at
    plan-build time (the df_cap/lsh_params derivation pattern —
    VERDICT r4 #1): ``ceil(B / SHARD_MAX_SUPERS)`` caps the super
    relation at 2^15 rows no matter how many fine buckets exist, so the
    prefix-offset stage is windows + one bounded BNLJ, never O(B^2)."""
    import math

    return max(1, math.ceil(n_buckets / SHARD_MAX_SUPERS))


def shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment: docs in deterministic doc_id order
    are packed into consecutive shards of ~SHARD_TOKENS tokens
    (shard_id = floor((cumsum - n_tokens) / budget) — i.e. the shard a
    doc STARTS in).

    TWO-LEVEL prefix sum — no global orderBy window, and (the r4 fix) no
    quadratic-in-bucket-count join either:

      1. each doc goes to a doc_id-contiguous fine bucket
         (``floor(doc_id / SHARD_BUCKET_DOCS)``) — B = N/1024 buckets;
      2. per-bucket token totals are one map-side-combinable groupBy
         (B tiny rows);
      3. fine buckets roll up into superbuckets of ``S = ceil(B / 2^15)``
         buckets each (S derived from the corpus doc_id range at
         plan-build, like ``df_cap``/``lsh_params``) — ≤ 2^15 supers;
      4. the WITHIN-super exclusive prefix is a window PARTITIONED by
         superbucket (parallel local sorts of ≤S tiny rows — a window,
         not a join, so this level costs O(B log S) total);
      5. only the ≤2^15-row super relation takes the broadcast non-equi
         self-join (``e_sbkt < sbkt``) — bounded at (2^15)^2 cheap long
         comparisons over a ~1 MB broadcast at ANY corpus size;
      6. the big table runs the cumsum window PARTITIONED by fine bucket
         (one ~1024-row local sort per bucket) and adds
         ``super_offset + intra_offset``.

    At the 100 TB design point (N ≈ 10^12 docs): B ≈ 10^9 fine buckets,
    S ≈ 3×10^4, supers = 2^15 — every stage is linear in B except the
    one capped BNLJ.  The offsets join onto the big table is a plain
    bkt-equi join (NOT a broadcast: B rows is tens of GB at 10^12 docs);
    its shuffle-by-bkt is the same partitioning the cumsum window needs,
    so the exchange is shared.  The only plan-build action is the
    column-pruned, map-side-combined ``max(doc_id)`` (one row to the
    driver, the lsh_params pattern).  A production run persists the
    B-row ``totals`` relation (two consumers: intra window + super
    rollup) via ``plans.cache.persist``.

    Identical math to the naive global ``Window.orderBy(doc_id)`` cumsum;
    the oracle below states exactly that global form."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    ).withColumn(
        "bkt", (F.col("doc_id") / SHARD_BUCKET_DOCS).cast("long")
    )
    max_id = _docs(spark, sf_dir).agg(F.max("doc_id")).collect()[0][0] or 0
    sup = shard_super_factor(int(max_id) // SHARD_BUCKET_DOCS + 1)
    # totals feeds two consumers (intra-super prefix window + super
    # rollup).  A ``cache.persist`` here was A/B-measured SLOWER at bench
    # scale (0.73 s -> 0.77-1.0 s: the relation is ~B = N/1024 rows, tiny
    # at test SFs, and the cache barrier costs more than the recompute);
    # a production 10^9-bucket run would persist or checkpoint it.
    totals = d.groupBy("bkt").agg(F.sum("n_tokens").alias("tot")).withColumn(
        "sbkt", (F.col("bkt") / sup).cast("long")
    )
    w_intra = Window.partitionBy("sbkt").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    intra = totals.withColumn(
        "intra", F.coalesce(F.sum("tot").over(w_intra), F.lit(0))
    )
    supers = totals.groupBy("sbkt").agg(F.sum("tot").alias("stot"))
    earlier = supers.select(
        F.col("sbkt").alias("e_sbkt"), F.col("stot").alias("e_stot")
    )
    soff = (
        supers.join(
            F.broadcast(earlier), F.col("e_sbkt") < F.col("sbkt"), "left"
        )
        .groupBy("sbkt")
        .agg(F.coalesce(F.sum("e_stot"), F.lit(0)).alias("soffset"))
    )
    offsets = intra.join(F.broadcast(soff), "sbkt").select(
        "bkt", (F.col("soffset") + F.col("intra")).alias("offset")
    )
    wloc = Window.partitionBy("bkt").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.col("offset") + F.sum("n_tokens").over(wloc)
    return (
        d.join(offsets, "bkt")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            ((cum - F.col("n_tokens")) / SHARD_TOKENS)
            .cast("long")
            .alias("shard_id"),
        )
    )


def shard_packing_oracle() -> str:
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(FLOOR((SUM(len(string_split(text, ' ')))
                     OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING)
                   - len(string_split(text, ' ')))::DOUBLE
                  / {SHARD_TOKENS}) AS BIGINT) AS shard_id
FROM documents
"""


# ------------------------------------------------------------------- pii ---

PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]+"
PII_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction stage of a training-data pipeline:
    emails, phone numbers, and IPv4 addresses replaced with typed
    placeholder tokens, all as JVM regexp expressions (no Python in the
    hot path, trivially map-side at any scale).

    The corpus text is synthetic and clean, so the fixture derives
    deterministic PII spans from doc_id (appended email / phone / IP for
    doc_id % 4 == 0/1/2, untouched for 3) — the oracle restates the same
    injection and the same regexes, so both engines must find the same
    matches AND produce byte-identical scrubbed text (checked via md5).
    Scrub order: emails, then phones, then IPs (each placeholder is
    inert under the later patterns).

    Counting uses the column-based ``F.regexp_count`` API, never patterns
    interpolated into ``F.expr`` SQL text: Spark's SQL string literals
    strip backslashes, so an embedded ``'\\.'`` silently becomes ``'.'``
    (any char) and the counts drift from the scrubber and the oracle.
    The ``doc_id % 4 == 3`` decoy tail (``'rev 1 2 3 4 at x@y z end'``)
    pins this: the digit run matches the UNescaped IPv4 pattern (space
    matches ``.``) and ``x@y z`` matches the unescaped email pattern, so
    any future regression re-breaks the hash."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    injected = F.expr(
        "CASE CAST(doc_id % 4 AS INT)"
        " WHEN 0 THEN text || ' contact user' || CAST(doc_id AS STRING)"
        "   || '@example.com now'"
        " WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0')"
        "   || '-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' today'"
        " WHEN 2 THEN text || ' from 10.' || CAST(doc_id % 256 AS STRING)"
        "   || '.0.' || CAST((doc_id * 7) % 256 AS STRING) || ' logged'"
        " ELSE text || ' rev 1 2 3 4 at x@y z end' END"
    )
    raw = d.select("doc_id", injected.alias("t"))
    prescrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), PII_EMAIL, "<EMAIL>"),
        PII_PHONE, "<PHONE>",
    )
    clean = F.regexp_replace(prescrubbed, PII_IP, "<IP>")
    return raw.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.regexp_count("t", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("t", F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        # IP count on the phone-scrubbed text: raw phone digits would
        # otherwise partially match the IPv4 pattern on one engine or the
        # other depending on leftmost-match tie-breaks — count what the
        # scrubber actually sees
        F.regexp_count(prescrubbed, F.lit(PII_IP)).cast("long").alias("n_ips"),
        F.md5(clean).alias("clean_fp"),
    )


def pii_scrub_oracle() -> str:
    return f"""
WITH raw AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
          WHEN 0 THEN text || ' contact user' || CAST(doc_id AS STRING)
            || '@example.com now'
          WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0')
            || '-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' today'
          WHEN 2 THEN text || ' from 10.' || CAST(doc_id % 256 AS STRING)
            || '.0.' || CAST((doc_id * 7) % 256 AS STRING) || ' logged'
          ELSE text || ' rev 1 2 3 4 at x@y z end' END AS t
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(
         regexp_replace(regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
                        '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_IP}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
             '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g'),
             '{PII_IP}', '<IP>', 'g')) AS clean_fp
FROM raw
"""


# ------------------------------------------------------------ repetition ---

REP_MAX_DUP_WORD_FRAC = 0.35
REP_MAX_TOP_WORD_FRAC = 0.12


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the Gopher A1.1 repetition
    filters that complement gopher_quality's length/stopword rules):
    duplicate-word fraction (1 - distinct/total, a pure array expression)
    and top-word fraction (count of the most frequent word / total, one
    map-side-combinable explode + two-level groupBy).  Docs over either
    threshold are flagged for removal."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    base = d.select(
        "doc_id", words.alias("w"), n.alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )
    top = (
        base.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    out = base.join(top, "doc_id").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_words").cast("long").alias("n_words"),
        F.round(
            1.0 - F.col("n_distinct") / F.col("n_words"), 4
        ).alias("dup_word_frac"),
        F.round(F.col("top_c") / F.col("n_words"), 4).alias("top_word_frac"),
    )
    keep = (
        (F.col("dup_word_frac") <= REP_MAX_DUP_WORD_FRAC)
        & (F.col("top_word_frac") <= REP_MAX_TOP_WORD_FRAC)
    )
    return out.withColumn("keep", keep)


def gopher_repetition_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n_words
  FROM documents
),
base AS (
  SELECT doc_id, n_words,
         len(list_distinct(w)) AS n_distinct
  FROM d
),
top AS (
  SELECT doc_id, MAX(c) AS top_c FROM (
    SELECT doc_id, word, COUNT(*) AS c FROM (
      SELECT doc_id, unnest(w) AS word FROM d
    ) GROUP BY doc_id, word
  ) GROUP BY doc_id
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(b.n_words AS BIGINT) AS n_words,
       ROUND(1.0 - b.n_distinct::DOUBLE / b.n_words, 4) AS dup_word_frac,
       ROUND(t.top_c::DOUBLE / b.n_words, 4) AS top_word_frac,
       (ROUND(1.0 - b.n_distinct::DOUBLE / b.n_words, 4)
          <= {REP_MAX_DUP_WORD_FRAC}
        AND ROUND(t.top_c::DOUBLE / b.n_words, 4)
          <= {REP_MAX_TOP_WORD_FRAC}) AS keep
FROM base b JOIN top t ON t.doc_id = b.doc_id
"""


# ---------------------------------------------------------------- scorecard --

FLUENT_MIN_MEAN_FREQ = 30.0


def curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed per-doc curation scorecard: every document-level
    signal the pipeline computes — Gopher quality, repetition, PII
    exposure, fluency, mixture coin — joined on the doc key into one
    keep/reject decision.

    This is the production shape for signal composition: each signal is
    computed by its own operator (at corpus scale they materialize as
    separate columns/stages), then the scorecard is a key-join of narrow
    (doc_id, flag) relations — every branch map-side combinable, every
    join on the same key.  The final ``keep`` requires all five gates."""
    from .text_analysis import text_fluency

    g = gopher_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("gopher_ok")
    )
    r = gopher_repetition(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_ok")
    )
    p = pii_scrub(spark, sf_dir).select(
        "doc_id",
        ((F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) == 0)
        .alias("pii_clean"),
    )
    f = text_fluency(spark, sf_dir).select(
        "doc_id",
        (F.col("mean_freq") >= FLUENT_MIN_MEAN_FREQ).alias("fluent"),
    )
    m = mixture_sample(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("mix_ok")
    )
    return (
        g.join(r, "doc_id").join(p, "doc_id").join(f, "doc_id")
        .join(m, "doc_id")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "gopher_ok", "rep_ok", "pii_clean", "fluent", "mix_ok",
            (F.col("gopher_ok") & F.col("rep_ok") & F.col("pii_clean")
             & F.col("fluent") & F.col("mix_ok")).alias("keep"),
        )
    )


def curation_scorecard_oracle() -> str:
    from .text_analysis import text_fluency_oracle

    return f"""
WITH g AS ({gopher_quality_oracle().strip()}),
r AS ({gopher_repetition_oracle().strip()}),
p AS ({pii_scrub_oracle().strip()}),
f AS ({text_fluency_oracle().strip()}),
m AS ({mixture_sample_oracle().strip()})
SELECT g.doc_id,
       g.keep AS gopher_ok,
       r.keep AS rep_ok,
       (p.n_emails + p.n_phones + p.n_ips) = 0 AS pii_clean,
       f.mean_freq >= {FLUENT_MIN_MEAN_FREQ} AS fluent,
       m.kept AS mix_ok,
       (g.keep AND r.keep AND (p.n_emails + p.n_phones + p.n_ips) = 0
        AND f.mean_freq >= {FLUENT_MIN_MEAN_FREQ} AND m.kept) AS keep
FROM g
JOIN r ON r.doc_id = g.doc_id
JOIN p ON p.doc_id = g.doc_id
JOIN f ON f.doc_id = g.doc_id
JOIN m ON m.doc_id = g.doc_id
"""


# -------------------------------------------------------------- full build --

BUILD_MIX_RATE = 80  # % of deduped docs kept by the mixture coin


def corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus build in one Catalyst plan — what a user of
    this engine actually ships: HTML extraction (mapInPandas kernel) →
    C4 line filter + global line dedup → exact doc dedup (first
    occurrence per content fingerprint, combinable groupBy-min) →
    deterministic mixture sampling (hash coin on the doc number parsed
    from the url) → token-budget shard packing over the survivors with
    the scale-safe two-phase cumsum (range buckets + lazy broadcast
    prefix offsets; no global sort).

    Emits one row per doc that survives every stage: (url, n_tokens,
    shard_id).  Every stage is individually oracle-verified elsewhere;
    this row verifies their COMPOSITION end to end."""
    cleaned = c4_line_dedup(spark, sf_dir)
    toks = F.size(F.split(F.regexp_replace("text", "\n", " "), " "))
    scored = cleaned.select(
        "url",
        toks.cast("long").alias("n_tokens"),
        F.md5("text").alias("fp"),
        F.regexp_extract("url", r"doc([0-9]+)$", 1).cast("long").alias("doc_no"),
    )
    # exact dedup: first occurrence (min doc_no) per content fingerprint
    firsts = (
        scored.groupBy("fp")
        .agg(F.min(F.struct("doc_no", "url", "n_tokens")).alias("k"))
        .select(
            F.col("k.doc_no").alias("doc_no"),
            F.col("k.url").alias("url"),
            F.col("k.n_tokens").alias("n_tokens"),
        )
    )
    coin = (F.col("doc_no") * F.lit(2654435761)) % F.lit(4294967296) % 100
    kept = firsts.where(coin < BUILD_MIX_RATE)
    # two-phase cumsum shard packing over the kept docs (doc_no order)
    d = kept.withColumn(
        "bkt", (F.col("doc_no") / SHARD_BUCKET_DOCS).cast("long")
    )
    totals = d.groupBy("bkt").agg(F.sum("n_tokens").alias("tot"))
    earlier = totals.select(
        F.col("bkt").alias("e_bkt"), F.col("tot").alias("e_tot")
    )
    offsets = (
        totals.join(
            F.broadcast(earlier), F.col("e_bkt") < F.col("bkt"), "left"
        )
        .groupBy("bkt")
        .agg(F.coalesce(F.sum("e_tot"), F.lit(0)).alias("offset"))
    )
    wloc = Window.partitionBy("bkt").orderBy("doc_no").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.col("offset") + F.sum("n_tokens").over(wloc)
    return (
        d.join(F.broadcast(offsets), "bkt")
        .select(
            "url",
            "n_tokens",
            ((cum - F.col("n_tokens")) / SHARD_TOKENS)
            .cast("long")
            .alias("shard_id"),
        )
    )


def corpus_build_oracle() -> str:
    return f"""
WITH cleaned AS ({c4_line_dedup_oracle().strip()}),
scored AS (
  SELECT url,
         CAST(len(string_split(replace(text, chr(10), ' '), ' ')) AS BIGINT)
           AS n_tokens,
         md5(text) AS fp,
         CAST(regexp_extract(url, 'doc([0-9]+)$', 1) AS BIGINT) AS doc_no
  FROM cleaned
),
firsts AS (
  SELECT fp, MIN(doc_no) AS doc_no FROM scored GROUP BY fp
),
kept AS (
  SELECT s.doc_no, s.url, s.n_tokens
  FROM scored s JOIN firsts f ON s.fp = f.fp AND s.doc_no = f.doc_no
  WHERE s.doc_no * 2654435761 % 4294967296 % 100 < {BUILD_MIX_RATE}
)
SELECT url, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_no
                                       ROWS UNBOUNDED PRECEDING)
                   - n_tokens)::DOUBLE / {SHARD_TOKENS}) AS BIGINT)
         AS shard_id
FROM kept
"""
