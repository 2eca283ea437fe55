package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** x1/x30/x100 ladder for the dedup MATERIALIZATION pipelines (q65
  * exact / q67 capped: pairs → components → sizes → survivors joined
  * back) and the blocklist-scrub → priority-sample composition
  * (q129) — the two headline families whose ladders stopped at x30
  * before round 14. Prints wall (min of 2, caches cleared) plus the
  * exchange cardinalities that say WHY: docs in, verified pairs,
  * survivors out. Usage: ProbeMaterializeScale <dir> [dir2 ...]. */
object ProbeMaterializeScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale_x30", "/tmp/scale_x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def minOf2(f: => Long): (Double, Long) = {
      def once: (Double, Long) = {
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
      val nDocs = docs.count()
      println(s"=== $dir: $nDocs docs")

      def materialize(cap: Option[Int], tag: String): Unit = {
        val (w, out) = minOf2 {
          val cl = Dedup.dupClusters(docs, 0.8, bucketCap = cap)
          val sizes = cl.groupBy("cluster_root")
            .agg(count(lit(1)).as("cluster_size"))
          cl.filter(col("keep"))
            .join(sizes, Seq("cluster_root"))
            .join(docs.select(col("doc_id"),
              length(col("text")).cast("long").as("n_chars")),
              Seq("doc_id"))
            .count()
        }
        val nPairs = (cap match {
          case Some(c) => Dedup.minhashDupPairsCapped(docs, 0.8, c)
          case None => Dedup.ngramJaccardPairs(docs, 0.8)
        }).count()
        println(f"[mat] $tag%-14s wall=$w%7.2f s  survivors=$out%8d  verified_pairs=$nPairs%8d")
      }
      materialize(Some(16), "q67 capped")
      materialize(None, "q65 exact")

      val (w129, n129) = minOf2 {
        Sampling.prioritySample(
          TextAnalysis.blocklistScrub(docs,
            graft.queries.Pipeline.ScrubPhrases)
            .select(col("doc_id"), col("scrubbed").as("text")),
          k = 25).count()
      }
      println(f"[mat] q129 scrub+samp wall=$w129%7.2f s  rows=$n129")
    }
    spark.stop()
  }
}
