package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TripSchema._

/** P5/P6/P10 + P7: the reference's import-time repairs and filters
  * (`db_importing.py:31-96`), as one narrow (shuffle-free) stage.
  */
object Quality {

  private def inBox(lat: Column, lon: Column): Column =
    lat.between(LatMin, LatMax) && lon.between(LonMin, LonMax)

  /** P5: conditional lat/lon swap repair (`db_importing.py:46-71`).
    * If (lat, lon) is inside the NYC bbox keep both, else swap — applied
    * independently to start and end coordinates. SQL 3-valued logic:
    * null coords fail BETWEEN, so they take the ELSE (swap) branch,
    * exactly like DuckDB. */
  def swapRepair(df: DataFrame): DataFrame = {
    val s = inBox(col("start_station_latitude"), col("start_station_longitude"))
    val e = inBox(col("end_station_latitude"), col("end_station_longitude"))
    df.withColumns(Map(
      "start_station_latitude" ->
        when(s, col("start_station_latitude")).otherwise(col("start_station_longitude")),
      "start_station_longitude" ->
        when(s, col("start_station_longitude")).otherwise(col("start_station_latitude")),
      "end_station_latitude" ->
        when(e, col("end_station_latitude")).otherwise(col("end_station_longitude")),
      "end_station_longitude" ->
        when(e, col("end_station_longitude")).otherwise(col("end_station_latitude"))))
  }

  /** P6: user-type normalization (`db_importing.py:11-14,25-28,72`).
    * The reference lowercases the *input* inside the CASE and the
    * *output* of the whole CASE. */
  def normalizeUserType(df: DataFrame): DataFrame = {
    val chain = userTypes.foldLeft(Option.empty[Column]) {
      case (acc, (from, to)) =>
        val w = acc match {
          case None => when(lower(col("user_type")) === from, lit(to))
          case Some(c) => c.when(lower(col("user_type")) === from, lit(to))
        }
        Some(w)
    }.get.otherwise(col("user_type"))
    df.withColumn("user_type", lower(chain))
  }

  /** P10: data-quality row filter (`db_importing.py:77-88`). Non-null-safe
    * `!=` comparisons drop NULL names/ids silently — preserved exactly.
    * `fileYear` drops rows whose start_time year differs from the archive
    * year (the reference's late-data policy). */
  def qualityFilter(df: DataFrame, fileYear: String): DataFrame =
    df.filter(
      col("start_station_name") =!= "" &&
        col("start_station_id") =!= "" &&
        col("start_station_latitude") =!= 0 &&
        col("end_station_latitude") =!= 0 &&
        !col("start_station_name").isin(stationBlacklist: _*) &&
        !col("end_station_name").isin(stationBlacklist: _*) &&
        col("start_station_latitude").isNotNull &&
        col("start_station_longitude").isNotNull &&
        col("end_station_latitude").isNotNull &&
        col("end_station_longitude").isNotNull &&
        date_format(col("start_time"), "yyyy") === fileYear)

  /** P7: derived period columns (`db_importing.py:74-75`): year 'yyyy'
    * and month as the English 3-letter name (Locale.US pinned by Spark's
    * default formatter locale). */
  def withPeriods(df: DataFrame): DataFrame =
    df.withColumn("year", date_format(col("start_time"), "yyyy"))
      .withColumn("month", date_format(col("start_time"), "MMM"))

  /** The full import stage: swap repair -> user type -> filter -> periods.
    * Matches the order of the reference's single INSERT..SELECT
    * (`db_importing.py:42-89`: REPLACE exprs compute on pre-filter values;
    * the WHERE runs over the *raw* columns, not the repaired ones —
    * DuckDB's REPLACE semantics — so the filter is applied first here). */
  def importTrips(normalized: DataFrame, fileYear: String): DataFrame =
    withPeriods(normalizeUserType(swapRepair(qualityFilter(normalized, fileYear))))
}
