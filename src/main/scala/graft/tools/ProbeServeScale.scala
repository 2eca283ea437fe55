package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.{Dedup, IvfIndex, Retrieval, TextAnalysis}

/** x1/x30/x100 ladder for the round-14 serving/classifier additions:
  * filtered ANN (q137 — both dispatch branches, cell size from the
  * √n/nProbe law so the IVF side scales the production way), hybrid
  * RRF fusion (q138 — cost should track its two underlying retrieval
  * ops, the fusion itself is bounded), edit-distance verification
  * over capped MinHash candidates (q139 — candidate generation is
  * the q61 machinery; the banded Levenshtein term is |candidates|·
  * maxDist·len), and the trained NB classifier (q140 — one train
  * pass, one scoring pass × |classes|).
  * Usage: ProbeServeScale [dir ...]. */
object ProbeServeScale {
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
        .select("doc_id", "text", "lang")
      val e = Tables.floored(spark, dir, "embeddings", "vec_id")
      val (nD, nV) = (docs.count(), e.count())
      val cell = IvfIndex.ivfCellConfig(nV, 4)
      println(s"=== $dir: $nD docs, $nV vecs, law cell=$cell")

      val (wRare, nRare) = minOf2(
        IvfIndex.filteredTopK(e, pmod(col("vec_id"), lit(50)) === 7,
          nQueries = 20, k = 5, cellSize = cell, nProbe = 4).count())
      println(f"[serve] q137 rare/prefilter   wall=$wRare%7.2f s  rows=$nRare")

      val (wBroad, nBroad) = minOf2(
        IvfIndex.filteredTopK(e, pmod(col("label"), lit(2)) === 0,
          nQueries = 20, k = 5, cellSize = cell, nProbe = 4).count())
      println(f"[serve] q137 broad/postfilter wall=$wBroad%7.2f s  rows=$nBroad")

      val (wHyb, nHyb) = minOf2(
        Retrieval.hybridTopK(docs.select("doc_id", "text"), e,
          Seq("spark", "window", "merge", "vector"), queryVecId = 7L,
          nLex = 20, nVec = 20, k = 10).count())
      println(f"[serve] q138 hybrid RRF       wall=$wHyb%7.2f s  rows=$nHyb")

      val (wEd, nEd) = minOf2 {
        val d = docs.select("doc_id", "text")
        Dedup.editVerifiedPairs(d,
          Dedup.minhashCandidatesCapped(d, maxBucket = 16),
          maxDist = 64).count()
      }
      println(f"[serve] q139 edit-verified    wall=$wEd%7.2f s  pairs=$nEd")

      val (wNb, nNb) = minOf2(
        TextAnalysis.nbLangClassifier(docs
          .select("doc_id", "lang", "text")).count())
      println(f"[serve] q140 NB classifier    wall=$wNb%7.2f s  docs=$nNb")

      val srcDocs = Tables.floored(spark, dir, "documents", "doc_id")
        .select("doc_id", "text", "source")
      val (wCe, nCe) = minOf2(
        TextAnalysis.crossEntropySelect(srcDocs,
          col("source") === "src0", buckets = 256).count())
      println(f"[serve] q141 CE select        wall=$wCe%7.2f s  docs=$nCe")

      val (wHv, nHv) = minOf2(
        Dedup.textNearDupPairsHashed(docs.select("doc_id", "text"),
          maxHamming = 3, minSimX1e6 = 800000L).count())
      println(f"[serve] q142 hashed near-dup  wall=$wHv%7.2f s  pairs=$nHv")
    }
    spark.stop()
  }
}
