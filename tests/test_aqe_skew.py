"""AQE skew-join handling: a deliberately hot key must trigger Spark's
adaptive skew-join split (the runtime remedy the SURVEY §4 plan names next
to manual salting)."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # fact table: 200k rows, 95% on one hot key
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        joined = fact.join(dim, "k")
        # collect() executes THIS DataFrame's own queryExecution (count()
        # plans a separate aggregate), finalizing the adaptive plan
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


def test_text_fluency_hot_cold_model_split(spark, tmp_path):
    """VERDICT r4 #5: text_fluency's bigram-keyed model join is rightly
    NOT broadcast as a whole (the n-gram table is huge at web scale),
    and AQE's skew split can NOT fire on it (the model side is an
    aggregation output, not a re-readable shuffle stage), so hot
    stop-bigrams must be handled structurally: keys above the derived
    frequency threshold join via a guaranteed-small broadcast, the tail
    via shuffle.  Pin the split shape on the REAL operator over a corpus
    with an injected hot bigram, and that scores stay exact through it."""
    import pandas as pd

    from pdfplumber_golang_spark.functions import text_analysis as TA

    hot = "of the " * 30 + "of the"          # every hot doc = same bigrams
    rows = [(i, hot) for i in range(1900)]
    rows += [(10_000 + i, f"u{i} v{i} w{i}") for i in range(100)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf.to_parquet(str(tmp_path / "documents.parquet"))

    # forbid auto-broadcast so the cold path shows its true shuffle shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = TA.text_fluency(spark, str(tmp_path))
        got = {r.doc_id: r for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
        # hot path: explicit broadcast hint survives the -1 threshold;
        # cold path: a genuine shuffled join; both under one union
        assert "BroadcastHashJoin" in plan, plan[:2000]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
        assert "Union" in plan, plan[:2000]
        # hot doc: 61 bigrams; 'of the' freq=31*1900, 'the of' freq=30*1900
        assert got[0].n_bigrams == 61
        assert got[0].sum_freq == 1900 * (31 * 31 + 30 * 30)
        # unique doc: 2 bigrams, each corpus freq 1 (cold path)
        assert got[10_000].n_bigrams == 2
        assert got[10_000].sum_freq == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
