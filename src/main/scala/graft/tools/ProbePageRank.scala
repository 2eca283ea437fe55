package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component attribution for q123: the pair derivation alone vs the
  * composed PageRank at 1 and 3 sweeps — isolates the sweeps' stage
  * overhead from the corpus-sized pair machinery. Usage: ProbePageRank [dir] */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")
    def pairs = graft.ops.Dedup.ngramJaccardPairs(docs, 0.8)
      .select(col("doc_a"), col("doc_b"))
    def time(tag: String)(run: => Long): Unit = {
      run // warm (Janino/codegen compile, parquet footers)
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = run
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag: ${ts.map(_._1).min}%.2fs (rows ${ts.head._2}; " +
        s"runs ${ts.map(t => f"${t._1}%.2f").mkString(", ")})")
    }
    // the exact-pair legs are skipped past x30: q22's exact
    // formulation is the documented family crossover — production
    // corpora route to the capped LSH pairing below, which is also
    // the only formulation worth timing at 500k docs
    if (sys.env.get("SPARK_GRAFT_PR_SKIP_EXACT").isEmpty) {
      time("pairs only, run 1")(pairs.count())
      time("pairs only, run 2")(pairs.count())
      for (it <- Seq(1, 2, 3)) {
        time(s"pagerank iters=$it")(
          graft.ops.Dedup.neardupPageRank(pairs, it).count())
      }
      time("pagerank iters=3 again")(
        graft.ops.Dedup.neardupPageRank(pairs, 3).count())
    }
    // the production pair source past the q22 crossover: bucket-capped
    // MinHash-LSH (q61's machinery) drops in unchanged — this is the
    // pairing a 100-TB run would actually feed the graph
    def cappedPairs = graft.ops.Dedup
      .minhashDupPairsCapped(docs, 0.8, maxBucket = 64)
      .select(col("doc_a"), col("doc_b"))
    time("capped pairs only")(cappedPairs.count())
    time("pagerank iters=3 over capped pairs")(
      graft.ops.Dedup.neardupPageRank(cappedPairs, 3).count())
    spark.stop()
  }
}
