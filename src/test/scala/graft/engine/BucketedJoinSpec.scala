package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Bucketing = the pay-the-shuffle-once story: two tables bucketed on
  * the join key must join with ZERO exchanges in the physical plan. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key runs without any exchange") {
    val wh = new java.io.File(tmpDir("bucket-wh")).getAbsolutePath
    val docs = (1L to 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val stats = (1L to 1000L).map(i => (i, i % 7)).toDF("doc_id", "score")
    val docsT =
      TableStore.writeBucketed(docs, wh, "bjs_docs", 8, Seq("doc_id"), Seq("doc_id"))
    val statsT =
      TableStore.writeBucketed(stats, wh, "bjs_stats", 8, Seq("doc_id"), Seq("doc_id"))
    // files live in the TableStore warehouse, not the session default
    assert(new java.io.File(s"$wh/bjs_docs").exists())
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(docsT)
        .join(spark.table(statsT), "doc_id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql(s"DROP TABLE IF EXISTS $docsT")
      spark.sql(s"DROP TABLE IF EXISTS $statsT")
    }
  }

  test("same table name in two warehouses gets two catalog entries, " +
    "and a rewrite survives with the old data never missing") {
    val wh1 = new java.io.File(tmpDir("bucket-whA")).getAbsolutePath
    val wh2 = new java.io.File(tmpDir("bucket-whB")).getAbsolutePath
    val d1 = Seq((1L, "one")).toDF("doc_id", "text")
    val d2 = Seq((2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val n1 = TableStore.writeBucketed(d1, wh1, "bjs_same", 2, Seq("doc_id"))
    val n2 = TableStore.writeBucketed(d2, wh2, "bjs_same", 2, Seq("doc_id"))
    try {
      assert(n1 != n2, "two warehouses must not share a catalog entry")
      assert(spark.table(n1).count() == 1 && spark.table(n2).count() == 2)
      // overwrite wh1's table; wh2's is untouched and wh1's swaps cleanly
      val n1b = TableStore.writeBucketed(
        Seq((7L, "seven"), (8L, "eight"), (9L, "nine")).toDF("doc_id", "text"),
        wh1, "bjs_same", 2, Seq("doc_id"))
      assert(n1b == n1)
      assert(spark.table(n1).count() == 3 && spark.table(n2).count() == 2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $n1")
      spark.sql(s"DROP TABLE IF EXISTS $n2")
    }
  }

  test("bucketedName normalizes warehouse spellings: slash and relative " +
    "forms of one directory name ONE catalog entry") {
    val abs = new java.io.File(tmpDir("bucket-norm")).getAbsolutePath
    val base = TableStore.bucketedName(spark, abs, "t")
    assert(TableStore.bucketedName(spark, abs + "/", "t") == base)
    assert(TableStore.bucketedName(spark, abs + "//", "t") == base)
    val rel = new java.io.File(".").toPath.toAbsolutePath.normalize()
      .relativize(new java.io.File(abs).toPath).toString
    assert(TableStore.bucketedName(spark, rel, "t") == base,
      s"relative spelling $rel diverged")
    // distinct warehouses still get distinct entries
    assert(TableStore.bucketedName(spark, abs + "_other", "t") != base)
  }

  test("aggregation keyed on the bucket column skips the exchange too") {
    val docs = (1L to 500L).map(i => (i, i % 3)).toDF("doc_id", "v")
    val aggT = TableStore.writeBucketed(docs, tmpDir("bucket-wh2"), "bjs_agg", 4,
      Seq("doc_id"))
    try {
      val agg = spark.table(aggT).groupBy("doc_id")
        .agg(sum(col("v")).as("s"))
      assert(agg.count() == 500)
      val plan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed aggregation still shuffles:\n$plan")
    } finally spark.sql(s"DROP TABLE IF EXISTS $aggT")
  }
}
