package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING text-corpus ingest — the crawl-shard landing pipeline as
  * a Structured Streaming job (the text-side sibling of
  * [[EventStream]]'s event twins): a file-watch source picks up
  * line-delimited shards as they arrive and lands them in the
  * `documents` contract plus the t28 chunk table, exactly-once via
  * the checkpointed file-source offsets.
  *
  * Design notes (reference has no streaming; this is the 100 TB
  * production shape):
  *  - The doc_id derivation needs a per-file line numbering
  *    (`Tables.documentsFromLines`), which is a window — illegal in a
  *    continuous streaming plan. It is SOUND per micro-batch because
  *    Spark's file source reads WHOLE files per batch: a file never
  *    spans batches, so batch-local numbering equals the batch
  *    recompute. foreachBatch makes that explicit.
  *  - Chunking is a stateless projection and rides the same batch.
  *  - foreachBatch is AT-LEAST-ONCE (a crash after a write but before
  *    the offset commit re-delivers the batch), so plain appends
  *    would duplicate doc_ids on restart. Each write lands in an
  *    `ingest_batch=<id>` partition under DYNAMIC partition
  *    overwrite: a replayed batch rewrites exactly its own partition
  *    — idempotent, and docs/chunks cannot diverge past one replay.
  *    At-least-once delivery × idempotent write = effectively-once.
  *  - At scale: `maxFilesPerTrigger` bounds batch size; the per-file
  *    window shuffles one shard's lines to one task, so shard size
  *    (hundreds of MB) is the parallelism unit — split multi-GB dumps
  *    upstream, same caveat as the batch ingest.
  */
object DocStream {

  /** File-watch source over line-delimited text shards: one row per
    * line, stamped with its source file (the streaming twin of
    * [[graft.sources.Tables.text]]). */
  def readLinesStream(spark: SparkSession, path: String,
                      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path)
      .withColumn("input_file", input_file_name())

  /** Land the line stream as `documents` + chunk parquet, one
    * `ingest_batch` partition per micro-batch (idempotent under
    * batch replay — see object notes). Returns the started query;
    * callers own lifecycle (processAllAvailable/stop in tests,
    * awaitTermination in production). */
  def docIngestSink(lines: DataFrame, docsPath: String, chunksPath: String,
                    checkpoint: String, lang: String = "und",
                    window: Int = 200, stride: Int = 160): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        def land(df: DataFrame, path: String): Unit =
          df.withColumn("ingest_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch").parquet(path)
        val docs = graft.sources.Tables.documentsFromLines(batch, lang)
          .persist()
        try {
          land(docs, docsPath)
          land(graft.text.TextAnalysis.chunk(docs, window, stride), chunksPath)
        } finally { docs.unpersist(); () }
      }
      .start()
}
