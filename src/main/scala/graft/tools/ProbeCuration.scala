package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ops.{Dedup, TextAnalysis}

/** One-off: partition counts + repartitioned-clean timing for q73. */
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
    val docs0 = Tables(spark, dir, "documents").select("doc_id", "text")
    println(s"[probe] raw scan partitions: ${docs0.rdd.getNumPartitions}")
    docs0.count()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      spark.catalog.clearCache()
      val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      val gated = docs.filter(TextAnalysis.qualityKeep(col("text")))
      val sized = TextAnalysis.lengthGateRetained(gated).filter(col("keep"))
      val clean = sized.select(col("doc_id"),
        TextAnalysis.scrubText(col("text")).as("text"), col("n_tokens"))
        .repartition(32, col("doc_id")).cache()
      t("cache clean repartitioned (count)") { clean.count() }
      println(s"[probe] clean partitions: ${clean.rdd.getNumPartitions}")
      t("dupClusters CLEAN-repart (count)") {
        Dedup.dupClusters(clean, 0.8, bucketCap = Some(16)).count() }
    }
    spark.stop()
  }
}
