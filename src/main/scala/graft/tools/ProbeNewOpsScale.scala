package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.{Dedup, IvfIndex, Pq, Sketches}

/** x1/x30/x100 ladder for the round-14 operators: containment dedup
  * (q133 shape, df-capped universe), sketch→rescue heavy hitters
  * (q134 — the grid is corpus-size-free; the DISTINCT probe grows
  * with vocabulary), and the vector-index delete lifecycle (q135 —
  * build → delete 1/7 → tombstoned serve → purge → served again).
  * Usage: ProbeNewOpsScale [dir ...]. */
object ProbeNewOpsScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale_x30", "/tmp/scale_x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def minOf2(f: => Long): (Double, Long) = {
      def once = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val a = once; val b = once
      (math.min(a._1, b._1), b._2)
    }

    dirs.foreach { dir =>
      val docs = Tables.floored(spark, dir, "documents", "doc_id")
        .select("doc_id", "text")
      val e = Tables.floored(spark, dir, "embeddings", "vec_id")
      val (nD, nV) = (docs.count(), e.count())
      println(s"=== $dir: $nD docs, $nV vecs")

      val (wCont, nCont) = minOf2(
        Dedup.containmentPairs(docs, minCx1000 = 800, maxDf = 64).count())
      println(f"[new] q133 containment  wall=$wCont%7.2f s  pairs=$nCont")

      val (wHH, nHH) = minOf2(
        Sketches.heavyHitters(docs, minCount = 500, depth = 4,
          width = 1024).count())
      println(f"[new] q134 heavyHitters wall=$wHH%7.2f s  hitters=$nHH")

      val cfg = Pq.PqConfig(m = 8, ksub = 128, bitsPerCode = 7, dim = 64)
      val (wDel, nDel) = minOf2 {
        val wh = s"target/graft-wh/probe-newops"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
        Pq.buildIvfPqIndex(e, cfg, cellSize = 64, wh, "idx", nBuckets = 8)
        Pq.deleteFromIndex(wh, "idx",
          e.filter(col("vec_id") % 7 === 3).select("vec_id"))
        val (cents, kCells) = IvfIndex.sampleQuantizerDf(e, 64)
        val cb = Pq.sampleCodebooks(e, cfg)
        val before = Pq.ivfPqServe(Pq.liveIndex(spark, wh, "idx"), e,
          cents, kCells, cb, cfg, 4, 20, 5, 50).count()
        val ct = Pq.purgeDeletes(spark, wh, "idx", nBuckets = 8)
        val after = Pq.ivfPqServe(spark.table(ct), e, cents, kCells, cb,
          cfg, 4, 20, 5, 50).count()
        require(before == after, s"serve drifted across purge: $before vs $after")
        after
      }
      println(f"[new] q135 delete cycle wall=$wDel%7.2f s  rows=$nDel")
    }
    spark.stop()
  }
}
