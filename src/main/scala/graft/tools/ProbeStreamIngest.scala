package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{IvfIndex, Pq}
import graft.streaming.StreamingVectorIngest

/** Growth evidence for the streaming ingest lifecycle (q106's path).
  *
  * The per-batch WORK is flat by construction — processBatch touches
  * only the batch (|batch|·k assignment + |batch| encode) and never
  * reads the index or the staging history. What is NOT structurally
  * flat, and what this probe measures, are the lifecycle's two hidden
  * growth terms over a long run of waves:
  *
  *  - the file source re-lists the source directory every drain and
  *    tracks every file ever seen in the checkpoint's file log
  *    (compacted every 10 batches by default) — O(files-so-far);
  *  - the staging sink accumulates one batch_id partition per wave,
  *    and the dynamic-overwrite machinery lists the table root.
  *
  * Output: per-wave drain wall for PROBE_WAVES waves (default 30) of
  * |corpus|/waves vectors each, the first-5 vs last-5 average (the
  * growth signal), and the cost of draining an EMPTY source before
  * any data exists (the fixed streaming-query startup the PLANS
  * overhead note prices). Ends with compact + one serve as a sanity
  * check that the grown index is complete.
  *
  * Usage: ProbeStreamIngest [dir]   (default /root/testdata/sf0.1)
  * Env: PROBE_WAVES (30), SPARK_GRAFT_CPUS (32),
  *      SPARK_GRAFT_SHUFFLE_PARTITIONS (8 — the q105-q108 sizing).
  */
object ProbeStreamIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val waves = sys.env.getOrElse("PROBE_WAVES", "30").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = new java.io.File("target/probe-stream-ingest")
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    val src = s"$root/src"
    val ckpt = s"$root/ckpt"
    val wh = s"$root/wh"

    val cfg = Pq.PqConfig(m = 8, ksub = 128, bitsPerCode = 7, dim = 64)
    val e = graft.engine.Tables(spark, dir, "embeddings")
    val vecs = e.select(col("vec_id"), col("embedding"))
    val n = vecs.count()
    val (cents, kCells) = IvfIndex.sampleQuantizerDf(e, targetCellSize = 64)
    val cb = Pq.sampleCodebooks(e, cfg)
    val idx = graft.engine.TableStore.writeBucketed(
      spark.range(0).select(col("id").as("cell"), col("id").as("vec_id"),
        col("id").as("pq_code")),
      wh, "probe_pqidx", nBuckets = 8, bucketCols = Seq("cell"))
    println(s"vectors=$n waves=$waves kCells=$kCells")

    def drain(): Double = {
      val t0 = System.nanoTime()
      StreamingVectorIngest.run(
        StreamingVectorIngest.vecStream(spark, src, vecs.schema),
        wh, "probe_stage", ckpt, cents, kCells, cb, cfg)
      (System.nanoTime() - t0) / 1e9
    }

    // fixed overhead: the source dir must exist for the stream to
    // start; an empty dir with no data files is the zero-work drain
    new java.io.File(src).mkdirs()
    val empty = (1 to 3).map(_ => drain())
    println(f"empty-source drain (pure startup): ${
      empty.map(t => f"$t%.2f").mkString(", ")} s")

    val walls = (0 until waves).map { w =>
      vecs.filter(col("vec_id") % waves === w)
        .coalesce(1).write.mode("append").parquet(src)
      val t = drain()
      println(f"wave $w%02d: $t%.2f s")
      t
    }
    val head = walls.take(5).sum / 5
    val tail = walls.takeRight(5).sum / 5
    println(f"first-5 avg ${head}%.2f s, last-5 avg ${tail}%.2f s, " +
      f"ratio ${tail / head}%.2f over $waves waves")

    val moved = StreamingVectorIngest.compact(spark, wh, "probe_stage", idx)
    val served = Pq.ivfPqServe(spark.table(idx), e, cents, kCells, cb, cfg,
      nProbe = 4, nQueries = 20, k = 5, shortlist = 50).count()
    println(s"compacted=$moved servedRows=$served")
    spark.stop()
  }
}
