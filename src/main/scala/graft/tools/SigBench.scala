package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

object SigBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale_x10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.engine.Tables(spark, dir, "embeddings").cache()
    println(s"rows=${e.count()}")
    for (np <- Seq(64, 128); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = Similarity
        .lshSignatureWords(e, Similarity.hyperplanes(np, 64))
        .select(sum(pmod(element_at(col("sigw"), 1), lit(1000000)))).head().getLong(0).toDouble
      println(f"planes=$np rep=$rep t=${(System.nanoTime()-t0)/1e9}%.2f s (chk=$n%.0f)")
    }
    spark.stop()
  }
}
