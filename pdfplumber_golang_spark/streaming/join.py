"""Stream-stream interval join: click→view attribution over the events
stream — the remaining Structured Streaming operator class (stateful
two-sided join), alongside the existing windowed aggs, stateful
sessionize, and watermark dedup.

Each 'click' joins the same user's 'view' events from the preceding
JOIN_INTERVAL — the canonical attribution query.  Both sides carry
event-time watermarks, so Spark bounds the join state: a side's rows are
evicted once the watermark passes ts + interval.  The default horizon
covers the fixture's replay span, making the drained AvailableNow result
EXACTLY the batch inner join (the oracle's SQL); in production the
horizon is the attribution window's retention knob, and state is one row
per in-horizon event per side.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)

JOIN_INTERVAL = "6 hours"
JOIN_WATERMARK = "45 days"


def stream_interval_join(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    interval: str = JOIN_INTERVAL,
    watermark: str = JOIN_WATERMARK,
) -> StreamingQuery:
    """File-stream the events table twice (clicks side, views side),
    inner-join on user with the view inside the click's look-back
    interval, sink exactly-once to parquet with Trigger.AvailableNow."""
    def side(event_type: str, prefix: str):
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(in_dir)
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", watermark)
        )

    clicks = side("click", "click")
    views = side("view", "view")
    joined = clicks.join(
        views,
        (F.col("click_user") == F.col("view_user"))
        & (F.col("view_ts") >= F.expr(f"click_ts - interval {interval}"))
        & (F.col("view_ts") <= F.col("click_ts")),
    ).select(
        "click_id", "view_id",
        F.col("click_user").alias("user_id"),
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
