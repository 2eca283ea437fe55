package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Hashing._
/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = graft.engine.Tables(spark, dir, "documents")
    val v1 = graft.ops.Dedup.shingleIndex(docs)
    println("=== shingleIndex plan:")
    println(v1.queryExecution.optimizedPlan.treeString.take(2500))
    time("v1 shingleIndex")(v1.write.format("noop").mode("overwrite").save())
    val v2 = docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(shinglesFromWords(col("w"))).as("s"))
    time("v2 direct two-step")(v2.write.format("noop").mode("overwrite").save())
    time("v2 again")(v2.write.format("noop").mode("overwrite").save())
    val docsLen = docs.select(length(col("text")).as("l"))
    docsLen.agg(avg("l"), max("l"), count(lit(1))).show()
    spark.stop()
  }
}
