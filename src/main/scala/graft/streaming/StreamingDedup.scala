package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructType}
import graft.engine.TableStore
import graft.ops.IncrementalDedup

/** Streaming form of the incremental-dedup operator: micro-batches of
  * documents drain from a file source, dedup within the batch and
  * against the accumulated history, and the survivors append to the
  * history table.
  *
  * Why not streaming `dropDuplicates`: Spark's built-in keeps every key
  * in the state store forever (or until a watermark evicts it, which
  * content keys never get) — at corpus scale that is an unbounded
  * state store holding billions of text hashes on the hot path. Here
  * history lives in the warehouse as plain parquet; each batch probes a
  * Bloom filter over historical hashes and exact-rescues only flagged
  * rows ([[IncrementalDedup.newDocsExact]] — no false negatives, no
  * false drops).
  *
  * Exactly-once without transactions: survivors write with DYNAMIC
  * partition overwrite into `batch_id=<id>`. A replayed micro-batch
  * (failure between sink write and checkpoint commit) recomputes the
  * same deterministic survivor set and overwrites its own partition —
  * duplicates cannot accumulate. This is the standard idempotent-sink
  * contract foreachBatch asks for.
  *
  * At 100 TB the per-batch history scan for the Bloom build is the one
  * non-incremental step; a production deployment persists the filter
  * and merges each batch's survivor hashes into it (Spark's BloomFilter
  * supports mergeInPlace), keeping per-batch work proportional to the
  * batch. The table layout here (append-only batch_id partitions)
  * already supports that: the filter build reads each partition once.
  *
  * Null semantics match q44's oracle (`NOT EXISTS`): NULL text equals
  * nothing, so null-text rows are always admitted — within a batch and
  * across batches.
  */
object StreamingDedup {

  /** History size (bytes on disk) below which [[processBatch]] skips
    * the Bloom prefilter for a direct anti-join: under it the history
    * side broadcasts anyway and the filter build's two extra actions
    * dominate; above it the Bloom keeps per-batch work batch-sized.
    * Same dispatch-by-one-cheap-measurement idea as
    * [[graft.ops.VocabJoin]], with the measurement free (driver-side
    * file metadata). */
  val BloomMinHistoryBytes: Long = 64L * 1024 * 1024

  /** Streaming source over document parquet files appearing under
    * `dir`. `maxFilesPerTrigger` slices an AvailableNow drain into
    * one micro-batch per that many files (oldest mtime first) — the
    * one-drain-many-batches shape the gate harnesses use so a
    * multi-wave lifecycle pays ONE streaming-query startup instead of
    * one per wave. */
  def docStream(spark: SparkSession, dir: String, schema: StructType,
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(dir)
  }

  /** History schema = doc schema + the batch_id partition column. */
  private def historySchema(doc: StructType): StructType =
    StructType(doc.fields :+
      org.apache.spark.sql.types.StructField("batch_id", LongType))

  /** One micro-batch: dedup within the batch and against history, then
    * dynamic-overwrite the survivors into this batch's partition.
    * Public so the replay-idempotency contract is directly testable —
    * processing the same (batch, batchId) twice must leave the table
    * byte-identical, because that is exactly what a post-failure
    * foreachBatch replay does. */
  def processBatch(batch: Dataset[Row], batchId: Long, warehouse: String,
                   table: String, expectedItems: Long = 1000000L,
                   fpp: Double = 0.03): Unit = {
    val spark = batch.sparkSession
    // partition-column inference is disabled in TableStore, so a
    // read-back batch_id is STRING — cast before comparing instead of
    // relying on implicit string-vs-bigint coercion
    val history = TableStore
      .readOrEmpty(spark, warehouse, table, historySchema(batch.schema))
      .filter(col("batch_id").isNull ||
        col("batch_id").cast("long") =!= batchId)
      .drop("batch_id")
    // within-batch keep-first (min doc_id per text); null-text rows
    // group with nobody and all pass through
    val nonNull = batch.filter(col("text").isNotNull)
    val firstPerText = nonNull
      .withColumn("__rn", row_number().over(
        Window.partitionBy("text").orderBy("doc_id")))
      .filter(col("__rn") === 1).drop("__rn")
    val candidates = firstPerText
      .unionByName(batch.filter(col("text").isNull))
    // size-dispatched history probe (driver-side FS metadata, no job):
    // while the history table is small the Bloom build's two actions
    // (emptiness probe + filter aggregation) cost more than they save
    // — a direct anti-join is one job and broadcast-sized. Past the
    // byte threshold the Bloom path takes over (the 100-TB shape:
    // per-batch work proportional to the batch, never a history join).
    val histPath = new org.apache.hadoop.fs.Path(
      TableStore.tablePath(warehouse, table))
    val hfs = histPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val histBytes =
      if (hfs.exists(histPath)) hfs.getContentSummary(histPath).getLength
      else 0L
    val fresh = (if (histBytes < BloomMinHistoryBytes)
        IncrementalDedup.newDocsExactDirect(history, candidates)
      else IncrementalDedup
        .newDocsExact(history, candidates, expectedItems, fpp))
      .transform(graft.engine.Checkpoints.pin)
    // empty batches write nothing: a parquet dir with zero row
    // groups is unreadable, and there is nothing to make idempotent
    if (!fresh.isEmpty) {
      TableStore.overwritePartitions(
        fresh.withColumn("batch_id", lit(batchId)),
        warehouse, table, Seq("batch_id"))
    }
    // the pin is batch-internal: release it or a long-running session
    // accrues a block-store entry per micro-batch (Dataset.unpersist
    // would be a silent no-op on a pinned frame — Checkpoints.release)
    graft.engine.Checkpoints.release(fresh)
  }

  /** Drain everything currently in the source (Trigger.AvailableNow),
    * appending deduped survivors to `warehouse/table` partitioned by
    * micro-batch id. Safe to call repeatedly; a call with no new files
    * is a no-op. */
  def run(stream: DataFrame, warehouse: String, table: String,
          checkpoint: String, expectedItems: Long = 1000000L,
          fpp: Double = 0.03): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, warehouse, table, expectedItems, fpp)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
