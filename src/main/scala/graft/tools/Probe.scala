package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch plan-audit main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("q01_linegraph", "q11_quality_filter", "q08_state_left_join",
                  "q04_dock_fullouter", "q03_topk_trips", "q25_similarity_topk",
                  "q23_dedup_minhash_lsh")) {
      println(s"##### $n")
      val df = graft.queries.Registry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(4000))
    }
    spark.stop()
  }
}
