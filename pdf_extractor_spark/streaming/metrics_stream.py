"""Streaming analytics over the metrics/lineage table (the dashboard's §2.7
aggregates as a live stream instead of analytics.py's full re-scan).

Watermarked windowed counts handle late metric rows (an executor's partition
commit landing after its wall-clock window) the way the reference's
'unparseable timestamps pass the filter' quirk never could: bounded state,
deterministic emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("pages_parsed", T.LongType()),
        T.StructField("spans_emitted", T.LongType()),
    ]
)


def stream_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    return spark.readStream.schema(METRICS_SCHEMA).parquet(metrics_dir)


def windowed_type_counts(
    metrics: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-window doc_type counts + success rate (the §2.7 group-by-type and
    conditional-aggregate operators, streaming form). State is bounded by
    the watermark; null doc_type folds to 'Desconhecido' exactly like
    analytics.py:140."""
    return (
        metrics.withWatermark("timestamp", watermark)
        .groupBy(
            F.window("timestamp", window).alias("win"),
            F.coalesce(F.col("doc_type"), F.lit("Desconhecido")).alias("doc_type"),
        )
        .agg(
            F.count("*").alias("count"),
            F.round(
                F.avg(F.col("success").cast("double")) * 100, 4
            ).alias("success_rate"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "doc_type",
            "count",
            "success_rate",
        )
    )
