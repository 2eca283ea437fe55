package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw throughput of the corpus shingle projection: the
  * [[graft.functions.WordShinglesExpr]] codegen kernel vs the legacy
  * `transform`-based (CodegenFallback) formulation, isolated from the
  * joins/aggregates of the queries that consume it. Replicated 20× so
  * the projection dominates scheduling noise.
  *
  * Usage: ProbeShingles [dir]  (default /root/testdata/sf0.1)
  */
object ProbeShingles {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(explode(array((0 until 20).map(lit): _*)).as("rep"),
        col("text"))
      .select(split(trim(lower(col("text"))), "\\s+").as("w"))
      .cache()
    println(s"rows=${docs.count()}")
    def legacy3 = {
      val base = when(size(col("w")) >= 3,
        transform(sequence(lit(0), size(col("w")) - lit(3)), i =>
          concat_ws(" ",
            element_at(col("w"), i + lit(1)),
            element_at(col("w"), i + lit(2)),
            element_at(col("w"), i + lit(3)))))
        .otherwise(array().cast("array<string>"))
      array_distinct(base)
    }
    def kernel3 =
      graft.functions.TextFunctions.wordShingles(col("w"), 3,
        distinct = true)
    def time(tag: String)(c: org.apache.spark.sql.Column): Unit = {
      // warm once, then min-of-3
      docs.select(explode(c).as("s")).agg(count(lit(1))).head()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        docs.select(explode(c).as("s")).agg(count(lit(1))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${ts.min}%.2fs (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("legacy transform (CodegenFallback)")(legacy3)
    time("WordShinglesExpr kernel")(kernel3)
    spark.stop()
  }
}
