package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted aggregation equivalence + partition pruning on the persisted
  * fact table. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum equal plain groupBy on skewed data") {
    // hot key: 10k rows for "mega", a handful elsewhere
    val df = ((1 to 10000).map(_ => ("mega", 2L)) ++
      (1 to 7).map(i => (s"dock_$i", i.toLong))).toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val saltedN = Skew.saltedCount(df, Seq("k"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val saltedS = Skew.saltedSum(df, Seq("k"), col("v"), salts = 8, "s")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    plain.foreach { case (k, n, s) =>
      assert(saltedN(k) == n, s"count mismatch for $k")
      assert(saltedS(k) == s, s"sum mismatch for $k")
    }
  }

  test("ImportedTrips fact table: partition pruning on (year, month)") {
    val wh = tmpDir("prune-wh")
    val trips = Seq(
      ("2021", "Jan", "A"), ("2021", "Feb", "B"), ("2022", "Jan", "C"))
      .toDF("year", "month", "start_station_name")
    TableStore.overwritePartitions(trips, wh, "ImportedTrips", Seq("year", "month"))
    val q = TableStore.read(spark, wh, "ImportedTrips")
      .filter($"year" === "2021" && $"month" === "Jan")
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), plan.take(500))
    // only the matching partition's row comes back, schema kept strings
    val rows = q.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("start_station_name") == "A")
    assert(q.schema("year").dataType.typeName == "string")
  }
}
