package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Hashing, TextAnalysis}

/** A/B diagnosis for the q91 shape: the null-sentinel single-agg form
  * vs the previous doc-list join-back form, plus stage anatomy. */
object ProbeQ91 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: rows=$rows%d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    import Hashing.shingles3
    // stage anatomy on the CURRENT implementation
    time("A sentinel-form full")(
      TextAnalysis.referenceOverlapScore(d, "src0", 2)
        .orderBy("doc_id").count())
    // the sentinel explode alone
    val shS = d.select(col("doc_id"),
      explode(concat(coalesce(shingles3(col("text")),
        array().cast("array<string>")),
        array(lit(null).cast("string")))).as("s"))
    time("B sentinel explode only")(shS.count())
    // the plain explode alone (pre-sentinel shape)
    val shP = d.select(col("doc_id"),
      explode(shingles3(col("text"))).as("s"))
    time("C plain explode only")(shP.count())
    // vocab subtree alone
    val refVocab = d.filter(col("source") === "src0")
      .select(col("doc_id"), explode(shingles3(col("text"))).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("s"), lit(1).as("hit"))
    time("D vocab agg only")(refVocab.count())
    // sentinel + broadcast join + agg (no orderBy)
    val agg = shS.join(broadcast(refVocab), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(col("s")).as("n_tri"), count(col("hit")).as("ref_hits"))
    time("E join+agg, no sort")(agg.count())
    time("A2 sentinel-form full again")(
      TextAnalysis.referenceOverlapScore(d, "src0", 2)
        .orderBy("doc_id").count())
    spark.stop()
  }
}
