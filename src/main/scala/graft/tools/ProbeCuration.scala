package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** Stage-by-stage timing of the q73 curation composition as
  * registered (evolved from the round-9 partition-count one-off that
  * diagnosed the single-split scan floor). */
object ProbeCuration {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables(spark, dir, "documents").count() // warm scan path
    for (round <- 1 to 2) {
      println(s"--- round $round")
      spark.catalog.clearCache()
      val docs = Tables.floored(spark, dir, "documents", "doc_id")
        .select("doc_id", "text")
      val gated = docs.filter(TextAnalysis.qualityKeep(col("text")))
      val sized = TextAnalysis.lengthGateRetained(gated).filter(col("keep"))
      val clean = sized.select(col("doc_id"),
        TextAnalysis.scrubText(col("text")).as("text"), col("n_tokens"))
        .cache()
      val nClean = t("A gates+length+scrub+cache (count)") { clean.count() }
      println(s"[probe] clean rows: $nClean, partitions: ${clean.rdd.getNumPartitions}")
      val cl = t("B dupClusters (count forces)") {
        val c = Dedup.dupClusters(clean, 0.8, bucketCap = Some(16)); c.count(); c
      }
      val nDupped = cl.filter(!col("keep")).count()
      println(s"[probe] dedup-dropped rows: $nDupped (must be > 0 on a corpus with near-dups)")
      t("C sizes+joins+split+sort+materialize") {
        val sizes = cl.groupBy("cluster_root").agg(count(lit(1)).as("cluster_size"))
        val out = cl.filter(col("keep"))
          .join(sizes, Seq("cluster_root"))
          .join(clean.select("doc_id", "n_tokens"), Seq("doc_id"))
          .transform(d => Sampling.withSplit(d))
          .select(col("doc_id"), col("n_tokens"), col("cluster_root"),
            col("cluster_size"), col("bucket"), col("split"))
          .orderBy("doc_id")
          .transform(graft.engine.Checkpoints.materialize)
        out.count()
      }
      clean.unpersist(blocking = false)
    }
    spark.stop()
  }
}
