package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Scale ladder for the q96 shape: SemDeDup centroid-keep over the
  * production-threshold (LSH-pruned) pair path with planted clones.
  * Usage: ProbeSemDedup [dir]; PROBE_SIM (default 0.7). */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sim = sys.env.getOrElse("PROBE_SIM", "0.7").toDouble
    val e = Similarity.plantNearDups(
      graft.engine.Tables(spark, dir, "embeddings"), 50)
    println(s"vectors=${e.count()} sim=$sim")
    val t0 = System.nanoTime()
    val out = Similarity.semDedupKeep(e, sim)
    val kept = out.filter(org.apache.spark.sql.functions.col("keep")).count()
    val total = out.count()
    println(f"semDedupKeep: kept=$kept%d of $total%d " +
      f"t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
