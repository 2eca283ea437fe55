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
    TableStore.writeBucketed(docs, wh, "bjs_docs", 8, Seq("doc_id"), Seq("doc_id"))
    TableStore.writeBucketed(stats, wh, "bjs_stats", 8, Seq("doc_id"), Seq("doc_id"))
    // files live in the TableStore warehouse, not the session default
    assert(new java.io.File(s"$wh/bjs_docs").exists())
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bjs_docs")
        .join(spark.table("bjs_stats"), "doc_id")
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
      spark.sql("DROP TABLE IF EXISTS bjs_docs")
      spark.sql("DROP TABLE IF EXISTS bjs_stats")
    }
  }

  test("aggregation keyed on the bucket column skips the exchange too") {
    val docs = (1L to 500L).map(i => (i, i % 3)).toDF("doc_id", "v")
    TableStore.writeBucketed(docs, tmpDir("bucket-wh2"), "bjs_agg", 4,
      Seq("doc_id"))
    try {
      val agg = spark.table("bjs_agg").groupBy("doc_id")
        .agg(sum(col("v")).as("s"))
      assert(agg.count() == 500)
      val plan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed aggregation still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS bjs_agg")
  }
}
