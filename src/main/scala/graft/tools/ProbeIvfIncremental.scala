package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.IvfIndex

/** Scale probe for incremental cell-partitioned re-dedup
  * (IvfIndex.buildCellIndex + incrementalNearDupPairs): per scale
  * dir, splits the corpus q79-style (history = vec_id % 3 <> 2,
  * delta = the rest), then times
  *   (a) FULL re-dedup of history ∪ delta via the join path — what a
  *       pipeline without the index must re-run on every batch,
  *   (b) the one-time index build over history (assign + bucketed
  *       write), and
  *   (c) the incremental delta run against the persisted index —
  *       the recurring cost the architecture actually pays,
  * plus the touched-cell fraction, which is the scan-pruning claim in
  * numbers. PROBE_SIM / PROBE_CELL / PROBE_DELTA_MOD override the
  * threshold (0.7), cell target (64), and how much of the corpus is
  * delta (vec_id % MOD == 2 of every MOD-th — larger MOD = smaller
  * delta, the regime the index exists for). */
object ProbeIvfIncremental {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale/x1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sim = sys.env.getOrElse("PROBE_SIM", "0.7").toDouble
    val cell = sys.env.getOrElse("PROBE_CELL", "64").toInt
    val mod = sys.env.getOrElse("PROBE_DELTA_MOD", "3").toLong

    val e = graft.engine.Tables(spark, dir, "embeddings")
    val hist = e.filter(col("vec_id") % mod =!= (mod - 1))
    val delta = e.filter(col("vec_id") % mod === (mod - 1))
    val n = e.count()
    val nd = delta.count()
    println(s"dir=$dir vectors=$n delta=$nd sim=$sim cell=$cell")

    def time[T](tag: String)(f: => T): T = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag: t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val (cents, k) = IvfIndex.sampleQuantizerDf(hist, cell)
    println(s"k=$k")

    time("full re-dedup (history ∪ delta)")(
      IvfIndex.nearDupPairsViaJoin(e, sim, cents, nProbe = 2,
        kEstimate = Some(k)).count())

    val wh = s"target/graft-wh/probe-incr-${new java.io.File(dir).getName}"
    val idx = time("index build (one-time)")(
      IvfIndex.buildCellIndex(hist, cents, wh, "cells", 32,
        nProbe = 2, kEstimate = Some(k)))

    val touched = IvfIndex.assignViaJoin(
        delta.select(col("vec_id"), col("embedding").as("v")), cents,
        2, 4096, Some(k))
      .select("cell").distinct().count()
    println(f"touched cells: $touched of $k (${100.0 * touched / k}%.1f%%)")

    time("incremental delta run (recurring)")(
      IvfIndex.incrementalNearDupPairs(spark.table(idx), delta, sim,
        cents, nProbe = 2, kEstimate = Some(k)).count())
    spark.stop()
  }
}
