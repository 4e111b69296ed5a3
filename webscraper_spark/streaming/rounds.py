"""Structured Streaming variant of the crawl ingest path (SURVEY §2.10
C10/C11).

The batch engine treats each crawl round as a Spark job over Iceberg
snapshots; this module is the continuous twin for deployments where
fetched WARC pages *arrive as a stream* (e.g. a fetcher fleet writing
page captures into a landing directory / Kafka topic). Semantics mirror
the batch round:

- **C10 newest-wins / late data**: event time = ``warc_ts`` with a
  watermark; duplicate captures of one url inside the watermark are
  dropped via ``dropDuplicates`` on the canonical hash (the batch twin
  is :func:`...operators.dedup.dedup_latest`). Note the deliberate
  semantic difference from the batch path: a capture arriving with an
  event time more than ``watermark`` behind the max seen ``warc_ts`` is
  dropped as *late* (bounded state), whereas a batch round admits any
  committed capture regardless of age. Size the watermark to the
  fetcher fleet's real delivery lag.
- **C1 admission**: per micro-batch, candidates anti-join the durable
  ``seen`` table and append the novel rows — exactly the batch round's
  discover step, executed by ``foreachBatch`` so the sink keeps the
  batch engine's table semantics (idempotent per epoch id).
- **C11 windows**: tumbling event-time windows per host give the
  per-round metrics the batch engine writes per round partition.

Scale shape: the stream is stateless except the watermark dedup state
(bounded by watermark horizon × arrival rate) and the anti-join probes
the same url_hash-bucketed seen table as the batch path. At 10^10-URL
scale you shard the query by ``pmod(url_hash, k)`` into k independent
streams, each with its own checkpoint dir.

Reference analog: the reference's "stream" is its while-loop over
companies with JSON checkpoints (``LinkedIn-Updated-Script.py:188-194``);
checkpointing here is Structured Streaming's WAL + state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.canon import with_canonical
from ..functions.extract import extract_udf


def admit_batch(
    batch_df: DataFrame, epoch_id: int, seen_path: str, out_path: str
) -> None:
    """One micro-batch's admission, IDEMPOTENT under re-delivery: BOTH
    sinks are epoch-partitioned and written with dynamic partition
    OVERWRITE, so a redelivered epoch rewrites exactly its own partitions
    (blind append would duplicate out_path rows; and if the seen append
    had committed first, the redelivered anti-join would drop the rows
    from out_path entirely). The seen read excludes the current epoch's
    own — possibly partially-committed — partition, so redelivery
    recomputes ``novel`` identically. Directly re-delivery-tested in
    tests/test_streaming.py."""
    from pyspark.errors import AnalysisException

    spark = batch_df.sparkSession
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        try:
            seen = (
                spark.read.parquet(seen_path)
                .filter(F.col("epoch") != epoch_id)
                .select("url_hash")
            )
            novel = batch_df.join(seen, on="url_hash", how="left_anti")
        except AnalysisException:  # missing path → first epoch
            novel = batch_df
        novel = novel.withColumn("epoch", F.lit(epoch_id)).persist()
        novel.write.mode("overwrite").partitionBy("epoch").parquet(out_path)
        (novel.select("url_hash", "epoch")
              .write.mode("overwrite").partitionBy("epoch").parquet(seen_path))
        novel.unpersist()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def streaming_ingest(
    pages_stream: DataFrame,
    seen_path: str,
    out_path: str,
    checkpoint: str,
    watermark: str = "1 hour",
):
    """Continuous fetch-ingest: canonicalize → watermark dedup → extract →
    anti-join durable seen → append novel page records.

    ``pages_stream`` is a streaming DataFrame with the pages schema
    (url, warc_ts, html, ...). Returns the started StreamingQuery.
    """
    canon = with_canonical(pages_stream)
    deduped = canon.withWatermark("warc_ts", watermark).dropDuplicates(["url_hash"])
    extracted = deduped.withColumn("ex", extract_udf("html")).select(
        "url_hash", "url", "host", "warc_ts",
        F.col("ex.title").alias("title"),
        F.col("ex.text").alias("text"),
        F.size("ex.outlinks").alias("n_outlinks"),
    )

    def _admit(batch_df: DataFrame, epoch_id: int) -> None:
        admit_batch(batch_df, epoch_id, seen_path, out_path)

    return (
        extracted.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_host_metrics(pages_stream: DataFrame, watermark: str = "1 hour",
                           window: str = "1 hour") -> DataFrame:
    """C11 tumbling event-time windows: per-host capture counts + bytes —
    the streaming twin of the batch metrics table (one row per round ×
    shard). Late captures beyond the watermark are dropped, matching the
    batch round's 'newest committed round wins' rule."""
    canon = with_canonical(pages_stream)
    return (
        canon.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("captures"),
            F.sum(F.length("html")).alias("bytes_html"),
            F.approx_count_distinct("url_hash").alias("approx_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "captures", "bytes_html", "approx_urls",
        )
    )
