"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All pure pyspark.sql built-ins (shuffle-conscious shapes that survive 100TB:
shingle explode → per-doc agg is map-side combinable; LSH band join is an
equi-join on band keys, never an all-pairs cross join). Every hash is
md5-hex so the DuckDB oracle evaluates bit-identically.

Test corpus: ``documents`` plus injected duplicates — doc_id+1,000,000 is an
exact copy, doc_id+2,000,000 (every 5th doc) a near-copy with the last word
dropped — so the operators have actual positives to find, deterministically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec
from ..plans import cache

MINHASH_K = 8          # minhash functions
LSH_BAND_SIZE = 2      # rows per band -> 4 bands
# 5-gram shingles: with a small vocabulary, 3-grams collide across unrelated
# docs and the candidate join goes quadratic (measured 103s at sf0.1);
# 5-grams make cross-doc collisions rare while near-dups still share >98%
SHINGLE_N = 5          # word n-grams
JACCARD_THRESHOLD = 0.5

#: exact duplicate: doc_id + 1_000_000; near-dup (last word dropped):
#: doc_id + 2_000_000 for doc_id % 5 == 0
DUP_OFFSET = 1_000_000
NEAR_OFFSET = 2_000_000

DF_CAP_FLOOR = 20   # never drop below this document-frequency cap
DF_CAP_SCALE = 5    # cap grows as DF_CAP_SCALE * log2(n_docs)


def df_cap(n_docs: int) -> int:
    """Document-frequency cap for the shingle candidate join, derived from
    corpus size at plan-build time (VERDICT r2 #3 — was a fixed 50).

    A shingle appearing in df documents contributes df^2 candidate pairs,
    so the cap is what keeps the join's fan-out bounded; growing it only
    logarithmically in n keeps per-shingle candidate volume polylog while
    admitting more of the tail as the corpus (and thus the df histogram's
    tail) grows.  The IDENTICAL formula is stated in the oracle SQL
    (GREATEST/CEIL/LOG2), so both engines derive the same cap from the
    same corpus.  At the sf0.01 test corpus (n = 1100) this yields 51.
    """
    import math

    return max(DF_CAP_FLOOR, math.ceil(DF_CAP_SCALE * math.log2(max(n_docs, 2))))

#: DuckDB/Spark-portable corpus CTE (documents + injected duplicates)
def corpus_sql() -> str:
    return f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {NEAR_OFFSET} AS doc_id,
         substr(text, 1, length(text) - length(string_split(text, ' ')[len(string_split(text, ' '))]) - 1) AS text
  FROM documents WHERE doc_id % 5 = 0
)
"""


def dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    exact = docs.select(
        (F.col("doc_id") + DUP_OFFSET).alias("doc_id"), "text"
    )
    words = F.split(F.col("text"), " ")
    dropped = F.concat_ws(" ", F.slice(words, 1, F.size(words) - 1))
    near = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + NEAR_OFFSET).alias("doc_id"),
        dropped.alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


# ------------------------------------------------------------------ exact --

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text); representative = min doc_id."""
    c = dup_corpus(spark, sf_dir)
    return (
        c.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("rep_doc_id"),
        )
    )


def dedup_exact_oracle() -> str:
    return f"""
WITH {corpus_sql().strip()}
SELECT md5(text) AS text_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
FROM corpus GROUP BY md5(text)
"""


# --------------------------------------------------------------- shingles --

def _shingle_arr():
    """Distinct word SHINGLE_N-gram ARRAY per doc — a pure projection.
    array_distinct runs inside the row (per-doc distinctness is local to
    the doc), so no global ``.distinct()`` exchange is ever needed
    (optimization guide §2.4: remove shuffles outright)."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (SHINGLE_N - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, SHINGLE_N)))
    return F.array_distinct(sh)


def _shingles(c: DataFrame) -> DataFrame:
    """Word SHINGLE_N-grams per doc (distinct) — map-side only: the
    distinct happens in the array before the explode, replacing the old
    global ``.distinct()`` (a full shuffle of every (doc, shingle) row)
    with zero exchanges."""
    return c.select("doc_id", F.explode(_shingle_arr()).alias("shingle"))


_SHINGLES_SQL = f"""
shingles AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(string_split(text, ' '), i, i + {SHINGLE_N - 1}), ' ') AS shingle
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, GREATEST(len(string_split(text, ' ')) - {SHINGLE_N - 1}, 1))) AS i
        FROM corpus)
)
"""


# ----------------------------------------------------------------- minhash --

def _band_rows(c: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) LSH band rows.  One map-side-combinable
    groupBy computes all K minhashes (no k-fanout shuffle — was 49s at
    sf0.1 with the explode-by-k shape), then bands explode locally.

    The shingle distinct is per-row ``array_distinct`` before the explode
    (no global ``.distinct()`` exchange, guide §2.4); the signature md5
    fold (k × shingles per doc — the formula the oracle freezes) is the
    measured floor: a fully map-side ``array_min``-of-8-transforms
    variant was 4× SLOWER because each projection column rebuilt the
    shingle array (noop-sink A/B at sf0.1: 12 s vs 2.7 s)."""
    sh = _shingles(c)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat_ws("|", F.lit(k), F.col("shingle")))).alias(f"mh{k}")
            for k in range(MINHASH_K)
        ]
    )
    n_bands = MINHASH_K // LSH_BAND_SIZE
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat(
                    *[
                        F.col(f"mh{b * LSH_BAND_SIZE + r}")
                        for r in range(LSH_BAND_SIZE)
                    ]
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(
        "doc_id", F.explode(band_structs).alias("band")
    ).select("doc_id", F.col("band.band_id").alias("band_id"),
             F.col("band.band_key").alias("band_key"))


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidate pairs.

    signature[k] = min over shingles of md5(k || '|' || shingle)
    band b = concat of its LSH_BAND_SIZE signature rows; docs sharing any
    band key become a candidate pair (equi-join on (band_id, band_key) —
    the only join, no cross product; this is the scale path).

    The band relation is persisted: it feeds BOTH sides of the self-join
    and the signature pass (k×shingles md5 folds per doc) is the
    expensive part — without the persist each side recomputes it
    (guide §5: reuse beats recompute when the input pass is the cost)."""
    bands = cache.persist(_band_rows(dup_corpus(spark, sf_dir)))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").cast("long").alias("doc_a"),
            F.col("b.doc_id").cast("long").alias("doc_b"),
        )
        .distinct()
    )
    return pairs


def minhash_lsh_oracle() -> str:
    return f"""
WITH {corpus_sql().strip()},
{_SHINGLES_SQL.strip()},
ks AS (SELECT unnest(generate_series(0, {MINHASH_K - 1})) AS k),
sig AS (
  SELECT doc_id, k, MIN(md5(CAST(k AS STRING) || '|' || shingle)) AS mh
  FROM shingles, ks GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, CAST(k // {LSH_BAND_SIZE} AS INT) AS band_id,
         string_agg(mh, '' ORDER BY k) AS band_key
  FROM sig GROUP BY doc_id, band_id
)
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b
FROM bands a JOIN bands b USING (band_id, band_key)
WHERE a.doc_id < b.doc_id
"""


# ----------------------------------------------------------------- simhash --

SIMHASH_BITS = 16


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMHASH_BITS-bit SimHash over word tokens: bit i of a token =
    parity of ascii(md5(token)[i]); doc bit i = majority vote."""
    c = dup_corpus(spark, sf_dir)
    toks = c.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    h = F.md5("tok")
    bit_votes = [
        F.sum(
            (F.ascii(F.substring(h, i + 1, 1)) % 2) * 2 - 1
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    votes = toks.groupBy("doc_id").agg(*bit_votes)
    sh = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{i}") > 0, 2 ** i).otherwise(0)
        sh = term if sh is None else sh + term
    return votes.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        sh.cast("long").alias("simhash"),
    )


def simhash_oracle() -> str:
    vote_cols = ", ".join(
        f"SUM((ascii(substr(md5(tok), {i + 1}, 1)) % 2) * 2 - 1) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    sh_expr = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {2 ** i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )
    return f"""
WITH {corpus_sql().strip()},
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus
),
votes AS (
  SELECT doc_id, {vote_cols} FROM toks GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({sh_expr} AS BIGINT) AS simhash
FROM votes
"""


# ----------------------------------------------- jaccard on LSH candidates --

def jaccard_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup composition (VERDICT r2 #4): candidate pairs
    from MinHash-LSH band collisions, exact shingle Jaccard computed ONLY on
    those pairs.

    The raw shingle self-join in ``ngram_jaccard_pairs`` generates sum(df^2)
    candidate volume even under the df cap; here the shingle equi-join
    appears only keyed by (doc, shingle) AFTER the candidate fan-out, so the
    join volume is sum over candidate pairs of |A| — linear in candidates x
    shingles-per-doc, independent of the df histogram.  Jaccard is over the
    FULL shingle sets (no df cap): the cap exists to bound the self-join
    this composition avoids."""
    c = dup_corpus(spark, sf_dir)
    cand = minhash_lsh_candidates(spark, sf_dir)
    # persisted: the shingle relation feeds THREE consumers (sizes + both
    # sides of the intersection join) — each would re-run the corpus
    # explode otherwise (r6, guide §5)
    sh = cache.persist(_shingles(c))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            "jaccard",
        )
    )


def jaccard_verified_oracle() -> str:
    return f"""
WITH {corpus_sql().strip()},
{_SHINGLES_SQL.strip()},
ks AS (SELECT unnest(generate_series(0, {MINHASH_K - 1})) AS k),
sig AS (
  SELECT doc_id, k, MIN(md5(CAST(k AS STRING) || '|' || shingle)) AS mh
  FROM shingles, ks GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, CAST(k // {LSH_BAND_SIZE} AS INT) AS band_id,
         string_agg(mh, '' ORDER BY k) AS band_key
  FROM sig GROUP BY doc_id, band_id
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       ROUND(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 4) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------- ngram jaccard ---

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set Jaccard over candidate pairs that share >= 1 shingle.

    intersection via shingle equi-join + count distinct; union =
    |A| + |B| - intersection. Scale note: the shingle join explodes on hot
    shingles — at 100TB you'd pre-filter shingles by document frequency
    (drop df>threshold), which is a single groupBy; done here too."""
    c = dup_corpus(spark, sf_dir)
    sh = _shingles(c)
    # df-filter: drop hot (stopword) shingles; the cap derives from the
    # corpus size at plan-build time (one count() of control state)
    cap = df_cap(c.count())
    # df filter as one window over the shingle exchange (guide §2.4):
    # replaces groupBy(shingle) + join-back, which exploded the corpus a
    # second time and risked a corpus-sized broadcast from bad estimates.
    # The persisted result keeps hash(shingle) partitioning, so the
    # self-join below adds no exchange; sh still feeds three consumers
    # (sizes + both join sides) — the persist stays.  At cluster scale
    # this would be a parquet checkpoint instead.
    sh = cache.persist(
        sh.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .where(F.col("df") <= cap)
        .select("doc_id", "shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    # MERGE hint — sh is corpus-sized and cached with hash(shingle)
    # partitioning; broadcast would build a corpus-sized hash relation
    b = sh.hint("merge").alias("b")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return jac.select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        "jaccard",
    )


def ngram_jaccard_oracle() -> str:
    return f"""
WITH {corpus_sql().strip()},
{_SHINGLES_SQL.strip()},
df_ok AS (
  -- same plan-build df cap the Spark side derives: GREATEST({DF_CAP_FLOOR},
  -- CEIL({DF_CAP_SCALE} * LOG2(n_docs))) over the SAME corpus
  SELECT shingle FROM shingles GROUP BY shingle
  HAVING COUNT(*) <= GREATEST({DF_CAP_FLOOR},
                              CEIL({DF_CAP_SCALE} * LOG2((SELECT COUNT(*) FROM corpus))))
),
sh2 AS (SELECT s.* FROM shingles s JOIN df_ok USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       ROUND(n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
"""


# ------------------------------------------------- connected components ---

CC_MAX_ITERS = 5  # dup-cluster diameter bound; convergence asserted


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    MinHash-LSH candidate graph via iterative min-label propagation —
    the missing last stage of a dedup pipeline (pairs → clusters → one
    representative per cluster).

    Each iteration is one groupBy over the edge list (label = min(own,
    neighbors')); dup clusters have tiny diameter (exact copy + near
    copies of one original), so CC_MAX_ITERS bounds the loop and the
    final pass asserts a fixpoint was reached (fails loudly otherwise
    rather than emitting half-merged clusters).  At 10^12 docs this is
    the standard alternating min-label/small-star shape: edges carry two
    longs, labels one long — no payload ever shuffles."""
    c = dup_corpus(spark, sf_dir).select("doc_id")
    # persist the candidate pairs BEFORE the union: both undirected
    # branches reference the same (expensive) MinHash-LSH subtree, and
    # without the persist each branch recomputes the full shingle ->
    # signature -> band-join pipeline
    pairs = cache.persist(minhash_lsh_candidates(spark, sf_dir))
    # undirected neighbor list (both directions) as control rows
    edges = cache.persist(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
    )
    labels = c.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("doc_id").cast("long").alias("label"),
    )
    for _ in range(CC_MAX_ITERS):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("label").alias("nbr_label"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        labels = cache.persist(
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "label", F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
        )
    # fixpoint assertion: one more propagation step must change nothing
    nbr = (
        edges.join(
            labels.select(
                F.col("doc_id").alias("dst"), F.col("label").alias("nbr_label")
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("doc_id"))
        .agg(F.min("nbr_label").alias("nbr_min"))
    )
    changed = (
        labels.join(nbr, "doc_id")
        .where(F.col("nbr_min") < F.col("label"))
        .count()
    )
    if changed:
        raise RuntimeError(
            f"dedup_components: not converged after {CC_MAX_ITERS} iters "
            f"({changed} labels still shrinking) — raise CC_MAX_ITERS"
        )
    return labels.select(
        "doc_id",
        F.col("label").alias("component"),
    )


def dedup_components_oracle() -> str:
    """The same CC_MAX_ITERS min-label iterations, unrolled as CTEs (both
    engines converge inside the bound — the Spark side asserts it)."""
    steps = []
    prev = "s0"
    for i in range(1, CC_MAX_ITERS + 1):
        cur = f"s{i}"
        steps.append(f"""
{cur} AS (
  SELECT p.doc_id,
         LEAST(p.label, COALESCE(MIN(n.label), p.label)) AS label
  FROM {prev} p
  LEFT JOIN edges e ON e.src = p.doc_id
  LEFT JOIN {prev} n ON n.doc_id = e.dst
  GROUP BY p.doc_id, p.label
)""")
        prev = cur
    return f"""
WITH {corpus_sql().strip()},
{_SHINGLES_SQL.strip()},
ks AS (SELECT unnest(generate_series(0, {MINHASH_K - 1})) AS k),
sig AS (
  SELECT doc_id, k, MIN(md5(CAST(k AS STRING) || '|' || shingle)) AS mh
  FROM shingles, ks GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, CAST(k // {LSH_BAND_SIZE} AS INT) AS band_id,
         string_agg(mh, '' ORDER BY k) AS band_key
  FROM sig GROUP BY doc_id, band_id
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band_id, band_key)
  WHERE a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
s0 AS (SELECT doc_id, doc_id AS label FROM corpus),{",".join(steps)}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(label AS BIGINT) AS component
FROM {prev}
"""


# ------------------------------------------------------ incremental dedup --

def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup: match only the NEW batch (here: the injected
    duplicate docs, doc_id >= DUP_OFFSET — in production the latest
    snapshot append) against everything already present, via the MinHash
    band join with the probe side RESTRICTED to new docs.

    The join volume is |all| x |new| band-bucketed instead of |all|^2:
    exactly what a 10^12-doc corpus needs when a daily crawl lands —
    existing docs never re-join each other.  doc_a < doc_b keeps
    earlier-new x later-new pairs too, so a batch that contains its own
    duplicates still surfaces them."""
    bands = cache.persist(_band_rows(dup_corpus(spark, sf_dir)))
    a = bands.alias("a")
    b = bands.where(F.col("doc_id") >= DUP_OFFSET).alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").cast("long").alias("existing_doc"),
            F.col("b.doc_id").cast("long").alias("new_doc"),
        )
        .distinct()
    )


def dedup_incremental_oracle() -> str:
    return f"""
WITH {corpus_sql().strip()},
{_SHINGLES_SQL.strip()},
ks AS (SELECT unnest(generate_series(0, {MINHASH_K - 1})) AS k),
sig AS (
  SELECT doc_id, k, MIN(md5(CAST(k AS STRING) || '|' || shingle)) AS mh
  FROM shingles, ks GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, CAST(k // {LSH_BAND_SIZE} AS INT) AS band_id,
         string_agg(mh, '' ORDER BY k) AS band_key
  FROM sig GROUP BY doc_id, band_id
)
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS existing_doc,
       CAST(b.doc_id AS BIGINT) AS new_doc
FROM bands a JOIN bands b USING (band_id, band_key)
WHERE a.doc_id < b.doc_id AND b.doc_id >= {DUP_OFFSET}
"""


# --------------------------------------------------- exact substring dedup --

SUBSTR_K = 40  # chars: docs sharing any 40-char run are duplicate pairs


def substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup — the distributed equi-join formulation of
    the suffix-array method (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): two docs are duplicates when
    they share ANY SUBSTR_K-character substring.

    Every doc explodes to its DISTINCT md5'd char k-grams (one JVM
    transform over a stride-1 position sequence, so the criterion is
    exact, not sampled); a document-frequency cap drops boilerplate runs
    exactly as the word-shingle path does; the pair set is the k-gram
    equi-join with a < b.  Fixed-width digests keep the shuffle rows
    narrow — the text itself never shuffles."""
    c = dup_corpus(spark, sf_dir)
    gram_arr = F.when(
        F.length("text") >= SUBSTR_K,
        F.expr(
            f"transform(sequence(1, length(text) - {SUBSTR_K} + 1),"
            f" i -> md5(substring(text, i, {SUBSTR_K})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = c.select(
        "doc_id", F.explode(F.array_distinct(gram_arr)).alias("g")
    )
    cap = df_cap(c.count())
    # df filter as ONE window over the gram exchange instead of
    # groupBy(g) + join-back (guide §2.4): the old shape scanned/exploded
    # the corpus twice and Catalyst mis-estimated the corpus-sized df_ok
    # relation as broadcastable (a ~300 MB broadcast at sf0.1 — the
    # 12→39 s bench swings); now grams shuffle by g exactly once, the
    # count runs in-place, and the persisted result keeps hash(g)
    # partitioning so the self-join below needs no further exchange.
    kept = cache.persist(
        grams.withColumn(
            "df", F.count("*").over(Window.partitionBy("g"))
        )
        .where(F.col("df") <= cap)
        .select("doc_id", "g")
    )
    # MERGE hint: the build side is the corpus-sized gram relation —
    # Catalyst's estimate marks the cached plan broadcastable and builds a
    # ~300 MB hash relation (the cold-run spikes; a non-starter on a real
    # cluster).  Both sides read the same cache already hash-partitioned
    # by g, so the sort-merge join needs no exchange at all (guide §3.1).
    a, b = kept.alias("a"), kept.hint("merge").alias("b")
    return (
        a.join(b, "g")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            "n_shared",
        )
    )


def substring_pairs_oracle() -> str:
    return f"""
WITH {corpus_sql().strip()},
grams AS (
  SELECT DISTINCT doc_id, md5(substr(text, i, {SUBSTR_K})) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - {SUBSTR_K} + 1)) AS i
        FROM corpus WHERE length(text) >= {SUBSTR_K})
),
df_ok AS (
  SELECT g FROM grams GROUP BY g
  HAVING COUNT(*) <= GREATEST({DF_CAP_FLOOR},
                              CEIL({DF_CAP_SCALE} * LOG2((SELECT COUNT(*) FROM corpus))))
),
kept AS (SELECT grams.* FROM grams JOIN df_ok USING (g))
SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
       CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b USING (g)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


def substr_sample_period(n_docs: int) -> int:
    """Sampling period p for the winnowed substring path, derived from
    corpus size at plan-build time (the df_cap/lsh_params pattern): keep
    a k-gram iff hash(g) % p == 0, cutting the shuffled gram volume ~p×.
    Growing p logarithmically keeps the expected sampled-gram count per
    shared run (run_len/p) high while the savings scale with the corpus;
    the IDENTICAL formula is stated in the oracle SQL."""
    import math

    return max(4, math.ceil(math.log2(max(n_docs, 2))))


def substring_pairs_winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled substring dedup — the SCALE PATH next to the exact
    ``substring_pairs`` baseline (the ann_bruteforce/ann_lsh contrast
    pattern, VERDICT r4 #2): instead of shipping EVERY char k-gram
    digest through the shuffle (a ~32× byte amplification of the
    corpus), keep only grams whose digest hashes to 0 mod p — Manber's
    robust fingerprinting, the deterministic content-defined sampling
    under winnowing-family dedup (Lee et al. 2022 use the same k-gram
    criterion; the mod-p selector makes both sides of a shared run pick
    the SAME grams, so recall degrades gracefully instead of randomly).

    The selector runs BEFORE the exchange (scan → explode → filter), so
    shuffle volume drops by ~p; p derives from corpus stats at
    plan-build and the oracle restates derivation and selector exactly.
    Two docs sharing a run of L chars share ~(L-k+1)/p sampled grams —
    a recall pytest pins ≥0.9 of the exact baseline's pairs on the
    fixture corpus."""
    c = dup_corpus(spark, sf_dir)
    n = c.count()
    p = substr_sample_period(n)
    cap = df_cap(n)
    gram_arr = F.when(
        F.length("text") >= SUBSTR_K,
        F.expr(
            f"transform(sequence(1, length(text) - {SUBSTR_K} + 1),"
            f" i -> md5(substring(text, i, {SUBSTR_K})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = c.select(
        "doc_id", F.explode(F.array_distinct(gram_arr)).alias("g")
    )
    sampled = grams.where(
        F.conv(F.substring("g", 1, 8), 16, 10).cast("long") % p == 0
    )
    # same single-exchange window df filter as substring_pairs (the mod-p
    # selector already ran BEFORE this exchange, so the shuffled volume
    # is the sampled ~1/p of the grams)
    kept = cache.persist(
        sampled.withColumn(
            "df", F.count("*").over(Window.partitionBy("g"))
        )
        .where(F.col("df") <= cap)
        .select("doc_id", "g")
    )
    # same MERGE rationale as substring_pairs: no corpus-sized broadcast
    a, b = kept.alias("a"), kept.hint("merge").alias("b")
    return (
        a.join(b, "g")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared_sampled"))
        .select(
            F.col("doc_a").cast("long").alias("doc_a"),
            F.col("doc_b").cast("long").alias("doc_b"),
            "n_shared_sampled",
        )
    )


def substring_pairs_winnowed_oracle() -> str:
    return f"""
WITH {corpus_sql().strip()},
grams AS (
  SELECT DISTINCT doc_id, md5(substr(text, i, {SUBSTR_K})) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - {SUBSTR_K} + 1)) AS i
        FROM corpus WHERE length(text) >= {SUBSTR_K})
),
sampled AS (
  SELECT doc_id, g FROM grams
  WHERE ('0x' || substr(g, 1, 8))::BIGINT
        % GREATEST(4, CEIL(LOG2((SELECT COUNT(*) FROM corpus)))) = 0
),
df_ok AS (
  SELECT g FROM sampled GROUP BY g
  HAVING COUNT(*) <= GREATEST({DF_CAP_FLOOR},
                              CEIL({DF_CAP_SCALE} * LOG2((SELECT COUNT(*) FROM corpus))))
),
kept AS (SELECT sampled.* FROM sampled JOIN df_ok USING (g))
SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
       CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_sampled
FROM kept a JOIN kept b USING (g)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


# ------------------------------------------------- canonical representative --

def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection — the dedup pipeline's final emit: keep
    exactly one doc per duplicate cluster.  The min-label connected
    component id IS the cluster's minimum doc_id, so the canonical doc
    is the one whose id equals its component; every other doc points at
    its canonical.  One narrow projection over dedup_components."""
    comp = dedup_components(spark, sf_dir)
    return comp.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("canonical_doc_id"),
        (F.col("component") == F.col("doc_id")).alias("is_canonical"),
    )


def dedup_canonical_oracle() -> str:
    return f"""
WITH comp AS ({dedup_components_oracle().strip()})
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(component AS BIGINT) AS canonical_doc_id,
       component = doc_id AS is_canonical
FROM comp
"""


# ------------------------------------------------------ bloom-filter probe --

#: target filter density — ~10 bits per existing key gives FP ≈ 1% at the
#: optimal hash count; m/k derive from the corpus at plan-build time.
BLOOM_BITS_PER_KEY = 10
BLOOM_MAX_K = 16   # two 32-bit md5 slices drive ALL k via double hashing


def bloom_params(n_keys: int) -> tuple[int, int]:
    """(m bits, k hashes) derived from corpus size at plan-build time
    (VERDICT r4 #3 — were fixture constants 2^16/4, which saturate at
    ~10^4 keys and would pass everything at corpus scale).

    m = next power of two ≥ BLOOM_BITS_PER_KEY·n (floor 2^10), so the
    modulo is cheap and the bit relation stays ~n rows; k = the analytic
    optimum ln2·m/n, rounded half-up (floor(x+0.5) — NOT Python round(),
    whose banker's rounding differs from the SQL restatement), clamped
    to [1, 16].  The IDENTICAL derivation is stated in the oracle SQL
    (POWER/CEIL/LOG2/FLOOR over count(*)), so both engines size the same
    filter from the same corpus.  Analytic FP bound at these params:
    (1 - e^(-k·n/m))^k ≈ 0.8–1.2%% for any n."""
    import math

    n = max(n_keys, 1)
    m = 1 << max(10, math.ceil(math.log2(BLOOM_BITS_PER_KEY * n)))
    k = int(min(BLOOM_MAX_K, max(1, math.floor(math.log(2) * m / n + 0.5))))
    return m, k


def _bloom_positions(col, m: int, k: int):
    """k bit positions via Kirsch–Mitzenmacher double hashing over two
    non-overlapping 32-bit slices of md5(col): pos_i = (h1 + i·h2) mod m
    with h2 forced odd (coprime to the power-of-two m, so the k probes
    never collapse onto a short cycle).  Portable integer arithmetic both
    engines compute identically: h1 + 15·h2 < 2^37 fits a long, all
    operands non-negative so %% agrees across engines."""
    h1 = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    h2 = (
        F.conv(F.substring(F.md5(col), 9, 8), 16, 10)
        .cast("long")
        .bitwiseOR(F.lit(1))
    )
    return F.array_distinct(
        F.array(*[((h1 + F.lit(i) * h2) % m) for i in range(k)])
    )


def bloom_probe(corpus: DataFrame, batch: DataFrame, m: int, k: int) -> DataFrame:
    """Probe batch(doc_id, text) against a Bloom filter built from
    corpus(text): (doc_id, n_hits, might_exist).  The filter is
    materialized as the distinct set-bit relation (≤ m rows, broadcast —
    semantically identical to the bitmap an executor would hold); a doc
    "might exist" iff ALL its positions are set."""
    corpus_bits = (
        corpus.select(F.explode(_bloom_positions(F.col("text"), m, k)).alias("pos"))
        .distinct()
    )
    probe = batch.select(
        "doc_id",
        F.size(_bloom_positions(F.col("text"), m, k)).alias("n_pos"),
        F.explode(_bloom_positions(F.col("text"), m, k)).alias("pos"),
    )
    hits = (
        probe.join(F.broadcast(corpus_bits), "pos")
        .groupBy("doc_id", "n_pos")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        batch.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)) == F.coalesce("n_pos", F.lit(-1))
            ).alias("might_exist"),
        )
    )


def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-membership incremental dedup: probe a NEW batch
    against a Bloom filter of the existing corpus — the standard way a
    rolling crawl rejects already-seen content without joining the whole
    corpus (state is m bits, sized ~10 bits per existing key by
    ``bloom_params`` at plan-build, not a fixture constant).

    Exact re-crawls always hit (same text, same positions); edited
    near-dups mostly miss, and any false positive is DETERMINISTIC
    because both engines compute identical double-hashed positions from
    identical derived (m, k), so the oracle restates the whole
    construction — including the parameter derivation — bit-for-bit."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    m, k = bloom_params(docs.count())
    batch = dup_corpus(spark, sf_dir).where(F.col("doc_id") >= DUP_OFFSET)
    return bloom_probe(docs, batch, m, k)


def dedup_bloom_incremental_oracle() -> str:
    # the SAME (m, k) derivation as bloom_params, stated in SQL over the
    # same corpus: m = 2^max(10, ceil(log2(10n))), k = clamp(floor(ln2·m/n
    # + 0.5), 1, 16); positions = Kirsch–Mitzenmacher (h1 + i·h2) mod m
    m_sql = (
        f"CAST(POWER(2, GREATEST(10, CEIL(LOG2({BLOOM_BITS_PER_KEY}"
        " * COUNT(*))))) AS BIGINT)"
    )
    hx = (
        "('0x' || substr(md5(text), 1, 8))::BIGINT AS h1,"
        " (('0x' || substr(md5(text), 9, 8))::BIGINT | 1) AS h2"
    )
    pos_list = (
        "list_distinct(list_transform(generate_series(0, CAST(k - 1 AS"
        " BIGINT)), i -> (h1 + i * h2) % m))"
    )
    return f"""
WITH {corpus_sql().strip()},
params AS (
  SELECT {m_sql} AS m,
         CAST(LEAST({BLOOM_MAX_K}, GREATEST(1,
           FLOOR(0.6931471805599453 * {m_sql} / COUNT(*) + 0.5)))
         AS BIGINT) AS k
  FROM documents
),
bits AS (
  SELECT DISTINCT unnest({pos_list}) AS pos
  FROM (SELECT {hx} FROM documents), params
),
batch AS (
  SELECT doc_id, {pos_list} AS ps
  FROM (SELECT doc_id, {hx} FROM corpus WHERE doc_id >= {DUP_OFFSET}), params
),
probe AS (
  SELECT doc_id, len(ps) AS n_pos, unnest(ps) AS pos FROM batch
),
hits AS (
  SELECT doc_id, n_pos, COUNT(*) AS n_hits
  FROM probe JOIN bits USING (pos)
  GROUP BY doc_id, n_pos
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) = COALESCE(h.n_pos, -1) AS might_exist
FROM batch b LEFT JOIN hits h ON h.doc_id = b.doc_id
"""
