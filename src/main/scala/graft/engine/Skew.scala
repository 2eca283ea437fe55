package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * Citibike data has mega-station skew (a handful of Manhattan docks
  * carry orders of magnitude more trips than the median dock, SURVEY
  * §7.4 item 7). Honest scoping of when each mechanism applies:
  *   - algebraic aggregates (sum/count/min/max): Spark's partial
  *     (map-side) aggregation already collapses the hot key per mapper —
  *     no salting needed;
  *   - joins on a hot key: AQE skew-join splitting handles it;
  *   - holistic aggregates (collect_list/set, exact percentiles) and
  *     aggregation after `spark.sql.aggregate.partialaggregate` is
  *     defeated (high group cardinality per mapper): salting is the fix —
  *     phase 1 aggregates on (key, salt) spreading the hot key over
  *     `salts` reducers, phase 2 folds the partials.
  *
  * The salted forms here are semantically identical to their plain
  * groupBy equivalents (asserted in SkewSpec) so they can be swapped in
  * when a profile shows a hot reducer.
  */
object Skew {

  /** count(*) grouped by `keys`, salted into `salts` partial groups.
    * Semantically identical to groupBy(keys).count(); two small shuffles
    * instead of one skewed one. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int,
                  resultName: String = "n"): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(resultName))
  }

  /** Generic salted sum over `valueCol`. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                salts: Int, resultName: String): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .withColumn("__v", valueCol)
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(resultName))
  }
}
