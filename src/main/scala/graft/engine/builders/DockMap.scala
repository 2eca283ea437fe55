package graft.engine.builders

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A4-A7 + A9 + J1/J4 + F13: per-station dock profile with nested
  * per-year / per-month usage stats (`update_dockmap.py`).
  *
  * The reference builds JSON strings per year in SQL, then deep-merges
  * them row-at-a-time in Python (`update_dockmap.py:161-196,219-251`).
  * Here the whole structure lives as typed nested maps —
  * `Map[year -> (year_starts, year_ends, Map[month -> (total, starts,
  * ends)])]` — merged with `map_zip_with`/`coalesce` higher-order
  * expressions (no UDF, no driver round-trip), and serialized with
  * `to_json` only at the storage boundary.
  *
  * Scale shape: two shuffles build the profile (station×year×month agg,
  * then station rollup); the merge with persisted state is one
  * full-outer join on station_name (~thousands of keys — broadcastable).
  */
object DockMap {

  val monthStatsType: StructType = StructType(Seq(
    StructField("month_total", LongType),
    StructField("month_starts", LongType),
    StructField("month_ends", LongType)))

  val yearStatsType: StructType = StructType(Seq(
    StructField("year_starts", LongType),
    StructField("year_ends", LongType),
    StructField("months", MapType(StringType, monthStatsType))))

  /** station_data map type: year -> yearStats. */
  val stationDataType: MapType = MapType(StringType, yearStatsType)

  /** Build the typed dock profile from an imported-trips batch.
    * Output: station_name, station_id, station_lat, station_lon,
    * station_data (typed map). Pickers are min-based where the reference
    * used ANY_VALUE, for determinism (SURVEY §7.4 item 5). */
  def build(imported: DataFrame): DataFrame = {
    def side(prefix: String, countName: String): DataFrame =
      imported.groupBy(
          col(s"${prefix}_station_name").as("station_name"),
          col("year"), col("month"))
        .agg(
          min(col(s"${prefix}_station_id")).as(s"${countName}_id"),
          min(col(s"${prefix}_station_latitude")).as(s"${countName}_lat"),
          min(col(s"${prefix}_station_longitude")).as(s"${countName}_lon"),
          count(lit(1)).as(s"${countName}_count"))

    val starts = side("start", "starts")
    val ends = side("end", "ends")

    val unioned = starts.join(ends, Seq("station_name", "year", "month"), "full_outer")
      .filter(col("station_name").isNotNull)
      .select(
        col("station_name"), col("year"), col("month"),
        coalesce(col("starts_id"), col("ends_id")).as("station_id"),
        coalesce(col("starts_lat"), col("ends_lat")).as("station_lat"),
        coalesce(col("starts_lon"), col("ends_lon")).as("station_lon"),
        coalesce(col("starts_count"), lit(0L)).as("month_starts"),
        coalesce(col("ends_count"), lit(0L)).as("month_ends"))
      .withColumn("month_total", col("month_starts") + col("month_ends"))

    val yearly = unioned.groupBy("station_name", "year")
      .agg(
        min(col("station_id")).as("station_id"),
        min(col("station_lat")).as("station_lat"),
        min(col("station_lon")).as("station_lon"),
        sum(col("month_starts")).as("year_starts"),
        sum(col("month_ends")).as("year_ends"),
        // array_sort: collect_list order follows task completion order,
        // so without it to_json at the storage boundary would serialize
        // different key orders run-to-run
        map_from_entries(array_sort(collect_list(struct(
          col("month"),
          struct(
            col("month_total").as("month_total"),
            col("month_starts").as("month_starts"),
            col("month_ends").as("month_ends")))))).as("months"))

    yearly.groupBy("station_name")
      .agg(
        min(col("station_id")).as("station_id"),
        min(col("station_lat")).as("station_lat"),
        min(col("station_lon")).as("station_lon"),
        // comparator form: the entry struct embeds a MapType (months),
        // which is not orderable, so sort on the year key explicitly
        map_from_entries(array_sort(collect_list(struct(
          col("year"),
          struct(
            col("year_starts").as("year_starts"),
            col("year_ends").as("year_ends"),
            col("months").as("months")))),
          (l, r) => when(l.getField("year") < r.getField("year"), lit(-1))
            .when(l.getField("year") === r.getField("year"), lit(0))
            .otherwise(lit(1)))).as("station_data"))
  }

  /** Deep merge of two year-maps, matching the reference's Python merge
    * (`update_dockmap.py:219-236`): per colliding year the NEW
    * year_starts/year_ends win and the month maps union with new months
    * winning; non-colliding years pass through. */
  def mergeYearMaps(existing: Column, delta: Column): Column =
    when(existing.isNull, delta)
      .when(delta.isNull, existing)
      .otherwise(map_zip_with(existing, delta, (_, ov, nv) =>
        when(ov.isNull, nv)
          .when(nv.isNull, ov)
          .otherwise(struct(
            nv.getField("year_starts").as("year_starts"),
            nv.getField("year_ends").as("year_ends"),
            map_zip_with(ov.getField("months"), nv.getField("months"),
              (_, om, nm) => coalesce(nm, om)).as("months")))))

  /** J4 + J5/J6 rewrite: full-outer merge with the persisted table;
    * id/coords take the delta's values when present (the reference's
    * UPDATE sets all four columns from the new row). */
  def merge(existing: DataFrame, delta: DataFrame): DataFrame = {
    val e = existing.select(col("station_name"),
      col("station_id").as("e_id"), col("station_lat").as("e_lat"),
      col("station_lon").as("e_lon"), col("station_data").as("e_data"))
    val d = delta.select(col("station_name"),
      col("station_id").as("d_id"), col("station_lat").as("d_lat"),
      col("station_lon").as("d_lon"), col("station_data").as("d_data"))
    e.join(d, Seq("station_name"), "full_outer")
      .select(
        col("station_name"),
        coalesce(col("d_id"), col("e_id")).as("station_id"),
        coalesce(col("d_lat"), col("e_lat")).as("station_lat"),
        coalesce(col("d_lon"), col("e_lon")).as("station_lon"),
        mergeYearMaps(col("e_data"), col("d_data")).as("station_data"))
  }

  /** Storage boundary (`table_list.py:37-43`: REAL coords, JSON data). */
  def toStorage(typed: DataFrame): DataFrame =
    typed.select(
      col("station_name"), col("station_id"),
      col("station_lat").cast("float"), col("station_lon").cast("float"),
      to_json(col("station_data")).as("station_data"))

  def fromStorage(stored: DataFrame): DataFrame =
    stored.select(
      col("station_name"), col("station_id"),
      col("station_lat").cast("double"), col("station_lon").cast("double"),
      from_json(col("station_data"), stationDataType).as("station_data"))
}
