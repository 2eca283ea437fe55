package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of a registered query — the
  * .explain feedback loop for plan-shape iteration. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbePlan <query-substring> [sfDir]")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(_.contains(args(0))).getOrElse(sys.error(s"no query ${args(0)}"))
    println(s"=== $name ===")
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
