package graft.engine.builders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Waypoints

/** A3 + W1 + F10-F12/F14: top-30 trips per year with route waypoints
  * (`update_tripsmap.py:23-95,100-221`).
  *
  * Schema: year TEXT, rideable_type TEXT, from_station TEXT, to_station
  * TEXT, trip_count INT, waypoints JSON (`table_list.py:50-57`).
  *
  * The reference collects the ranked rows to the driver for the Mapbox
  * calls; here the enrichment is a UDF over the (<= 30 x years)-row
  * DataFrame, so nothing leaves the executors. Ties in trip_count are
  * broken deterministically (from/to station) where the reference relied
  * on engine row order.
  */
object TripsMap {

  def build(imported: DataFrame,
            provider: Waypoints.RouteProvider = Waypoints.StraightLineRoutes): DataFrame = {
    val agg = imported
      .filter(col("start_station_name") =!= col("end_station_name"))
      .groupBy(
        col("year"),
        col("start_station_name").as("from_station"),
        col("start_station_latitude").as("from_lat"),
        col("start_station_longitude").as("from_lon"),
        col("end_station_name").as("to_station"),
        col("end_station_latitude").as("to_lat"),
        col("end_station_longitude").as("to_lon"),
        col("rideable_type"))
      .agg(count(lit(1)).cast("int").as("trip_count"),
        min(col("start_time")).as("trip_time"))
    val w = Window.partitionBy("year")
      .orderBy(col("trip_count").desc, col("from_station"), col("to_station"))
    val top = agg.withColumn("rn", row_number().over(w)).filter(col("rn") <= 30)
    top.withColumn("waypoints",
        to_json(Waypoints.waypointsUdf(provider)(
          col("from_lat"), col("from_lon"), col("to_lat"), col("to_lon"),
          col("trip_time"))))
      .select("year", "rideable_type", "from_station", "to_station",
        "trip_count", "waypoints")
  }

  /** Upsert (`update_tripsmap.py:38-56`): matched (year, from, to) rows
    * add trip_count but KEEP the existing waypoints (the reference's
    * UPDATE only sets trip_count); unmatched delta rows insert whole. */
  def merge(existing: DataFrame, delta: DataFrame): DataFrame = {
    val keys = Seq("year", "from_station", "to_station")
    val e = existing.withColumnRenamed("trip_count", "e_count")
      .withColumnRenamed("waypoints", "e_waypoints")
      .withColumnRenamed("rideable_type", "e_rideable")
    val d = delta.withColumnRenamed("trip_count", "d_count")
      .withColumnRenamed("waypoints", "d_waypoints")
      .withColumnRenamed("rideable_type", "d_rideable")
    e.join(d, keys, "full_outer")
      .select(
        col("year"),
        coalesce(col("e_rideable"), col("d_rideable")).as("rideable_type"),
        col("from_station"), col("to_station"),
        (coalesce(col("e_count"), lit(0)) + coalesce(col("d_count"), lit(0)))
          .cast("int").as("trip_count"),
        coalesce(col("e_waypoints"), col("d_waypoints")).as("waypoints"))
  }
}
