package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Tables.floored]]'s two-sided contract: it raises a
  * below-cores scan up to the session's core count (the driver's test
  * files are single-split, which would single-thread every narrow
  * stage), and it leaves an already-parallel scan untouched — the
  * floor must never insert a shuffle a cluster-scale scan doesn't
  * need, and never REDUCE parallelism.
  */
class TablesFlooredSpec extends SparkSpec {
  import spark.implicits._

  private val cores = spark.sparkContext.defaultParallelism

  test("single-split scan is floored to the session's core count") {
    val dir = tmpDir("floored-single")
    (1 to 100).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val df = Tables.floored(spark, dir, "documents", "doc_id")
    assert(df.rdd.getNumPartitions === cores)
    // The floor is a keyed repartition: deterministic, row-preserving.
    assert(df.count() === 100)
  }

  test("already-parallel scan passes through with no repartition") {
    val dir = tmpDir("floored-multi")
    val nFiles = cores * 2
    (1 to 1000).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(nFiles, col("doc_id")).write.parquet(s"$dir/documents.parquet")
    val df = Tables.floored(spark, dir, "documents", "doc_id")
    assert(df.rdd.getNumPartitions >= cores)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(df.count() === 1000)
  }
}
