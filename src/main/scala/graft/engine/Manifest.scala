package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-load manifest: which (year, month) periods are already in
  * the warehouse.
  *
  * Mirrors the reference's `StatusDataTable` semantics
  * (`new_file_check.py:15-45`, `update_status_data.py:9-51`):
  *   - a yearly archive marks the whole year loaded (`complete = true`);
  *   - monthly archives mark months `<= month` of that year loaded
  *     (`complete = false`).
  *
  * The manifest is tiny (one row per loaded period) so the anti-join is
  * always a broadcast; candidates never shuffle.
  */
object Manifest {

  /** J7: keep candidate periods not covered by the manifest. Non-equi
    * left-anti join: covered iff same year AND (year complete OR
    * candidate month <= manifest month). */
  def newPeriods(candidates: DataFrame, manifest: DataFrame): DataFrame = {
    val m = broadcast(manifest)
    candidates.join(
      m,
      candidates("year") === m("year") &&
        (m("complete") === lit(true) || candidates("month") <= m("month")),
      "left_anti")
  }

  /** J8 + status upsert: record a loaded period. A yearly load replaces
    * any monthly rows for that year; a monthly load keeps the max month
    * seen. Returns the new manifest. */
  def markLoaded(manifest: DataFrame, year: String, month: Int,
                 complete: Boolean): DataFrame = {
    val spark = manifest.sparkSession
    import spark.implicits._
    val delta = Seq((year, month, complete)).toDF("year", "month", "complete")
    manifest.unionByName(delta)
      .groupBy("year")
      .agg(
        max(when(col("complete"), lit(12)).otherwise(col("month"))).as("month"),
        max(col("complete")).as("complete"))
      .select(col("year"),
        when(col("complete"), lit(12)).otherwise(col("month")).as("month"),
        col("complete"))
  }
}
