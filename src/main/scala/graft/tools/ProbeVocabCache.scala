package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Retrieval, TextAnalysis}

/** Interleaved same-JVM A/B for the round-17 single-pass df cache in
  * the derived-vocabulary dispatch family (q131 tfidfKeywords, q136
  * clusterKeywords, q91/q95 referenceOverlapScore): `cached` routes
  * the vocabulary frame through [[graft.ops.VocabJoin.joinCached]]
  * (cache + count-the-cache dispatch), `uncached` is the pre-r17
  * `VocabJoin.join` (plan()'s count action and the join's build side
  * each re-evaluate the vocab frame's lineage). Both variants run
  * from the SAME production kernels via the `cachedDispatch` flag,
  * so the A/B cannot drift from what ships.
  *
  * MEASURED OUTCOME (sf0.1, mins over 3 interleaved reps): q91
  * 1.22 → 0.85 s (SHIPPED cached — the ref vocab's lineage is
  * disjoint from the stream side, nothing else deduped it); q131
  * 1.95 vs 2.03 s and q136 5.43 vs 6.33 s (WASH — their df build
  * side already shares the tf exchange via ReuseExchange inside the
  * serving action; both ship UNCACHED).
  *
  * Methodology (the ProbeNbSinglePass postmortem applied): reps are
  * INTERLEAVED across variants and the block cache is cleared before
  * every rep — a same-plan A/B without the clear measures the cache
  * and flatters whichever variant's plan is stable across reps.
  * Row parity is asserted via count + an order-independent xxhash64
  * checksum (no driver collect of corpus-scale output).
  *
  * Usage: ProbeVocabCache [dir] [reps] */
object ProbeVocabCache {

  private def checksum(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted.map(col)
    // decimal(38,0) sum: a long sum of xxhash64 overflows under ANSI
    val row = df.select(
      count(lit(1)).as("n"),
      sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("h")).head()
    (row.getLong(0), if (row.isNullAt(1)) "0" else row.getDecimal(1).toString)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")

    // (name, cachedDispatch => frame) — q136's cluster frame is
    // rebuilt inside the thunk so each rep pays the full gated cost
    val ops: Seq[(String, Boolean => DataFrame)] = Seq(
      ("q131_tfidf", c => Retrieval.tfidfKeywordsDispatch(docs, 3, c)),
      ("q136_clusterkw", c => Retrieval.clusterKeywordsDispatch(docs,
        Dedup.dupClusters(docs, 0.8, bucketCap = Some(16)), 3, c)),
      ("q91_refoverlap", c => TextAnalysis.referenceOverlapDispatch(
        docs, "src0", 2, c)))

    ops.foreach { case (name, build) =>
      // parity first (fresh cache state), then interleaved timing
      spark.sharedState.cacheManager.clearCache()
      val a = checksum(build(true))
      spark.sharedState.cacheManager.clearCache()
      val b = checksum(build(false))
      require(a == b, s"$name diverged: cached=$a uncached=$b")
      val times = collection.mutable.Map(
        "cached" -> List.empty[Double], "uncached" -> List.empty[Double])
      for (_ <- 1 to reps; (tag, flag) <- Seq("cached" -> true,
          "uncached" -> false)) {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        build(flag).write.format("noop").mode("overwrite").save()
        times(tag) = times(tag) :+ (System.nanoTime() - t0) / 1e9
      }
      Seq("cached", "uncached").foreach { tag =>
        val ts = times(tag)
        println(f"$name%-16s $tag%-9s min ${ts.min}%.2fs  " +
          s"(runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
      println(s"$name rows identical: n=${a._1}")
    }
    spark.stop()
  }
}
