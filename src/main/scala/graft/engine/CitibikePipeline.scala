package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.builders._

/** The full incremental pipeline (§3.1 of SURVEY.md): discover archives,
  * skip already-loaded periods via the manifest, normalize + repair each
  * archive, and upsert the five derived tables in the warehouse.
  *
  * One lazy DAG per archive: `zip -> csv -> Normalize -> Quality`,
  * cached once and fanned out to the five builders (the reference's
  * staging `ImportedTable`, `db_importing.py:32-35`).
  */
object CitibikePipeline {

  val lineGraphSchema: StructType = StructType(Seq(
    StructField("year", StringType), StructField("month", StringType),
    StructField("subscriber_count", IntegerType),
    StructField("customer_count", IntegerType)))

  val heatMapSchema: StructType = StructType(Seq(
    StructField("year", StringType), StructField("month", StringType),
    StructField("hour", IntegerType), StructField("total_count", IntegerType)))

  val tripTableSchema: StructType = StructType(Seq(
    StructField("year", StringType), StructField("rideable_type", StringType),
    StructField("from_station", StringType), StructField("to_station", StringType),
    StructField("trip_count", IntegerType), StructField("waypoints", StringType)))

  val dockTableSchema: StructType = StructType(Seq(
    StructField("station_name", StringType), StructField("station_id", StringType),
    StructField("station_lat", FloatType), StructField("station_lon", FloatType),
    StructField("station_data", StringType)))

  /** Process every new archive in `inputDir` into `warehouse`. Returns
    * the number of archives loaded.
    *
    * Failure model: per-archive processing is not transactional across
    * the five derived tables — a crash mid-archive can leave some
    * tables merged and the manifest unwritten, and the additive upserts
    * would re-add on rerun (the fact table is safe: dynamic partition
    * overwrite). The reference has the same exposure (sequential SQL
    * statements on one DuckDB file). The cluster-grade fix is a
    * transactional table format; with plain parquet, recovery is
    * re-deriving the five tables from ImportedTrips. */
  def run(spark: SparkSession, inputDir: String, warehouse: String,
          provider: Waypoints.RouteProvider = Waypoints.StraightLineRoutes,
          distributedIngest: Boolean = true): Int = {
    val archives = Ingest.listArchives(inputDir,
      spark.sparkContext.hadoopConfiguration)
    var manifest = TableStore.readOrEmpty(spark, warehouse, "StatusDataTable",
      StatusData.schema)
    // Manifest is tiny — one decision per archive on the driver (J7/J8).
    val newOnes = archives.filterNot(a =>
      StatusData.alreadyLoaded(manifest, a.year.toInt, a.month.map(_.toInt)))

    newOnes.foreach { a =>
      val raw = if (distributedIngest) Ingest.readArchiveDistributed(spark, a)
                else Ingest.readArchive(spark, a)
      val imported = Quality.importTrips(raw, a.year).cache()
      try {
        // the canonical fact table, partitioned for per-period pruning
        // (replaces the reference's (year, month) ART index, S12);
        // dynamic overwrite => re-processing a period is idempotent
        TableStore.overwritePartitions(imported, warehouse, "ImportedTrips",
          partitionBy = Seq("year", "month"))
        updateLineGraph(spark, warehouse, imported)
        updateHeatMap(spark, warehouse, imported)
        updateTripsMap(spark, warehouse, imported, provider)
        updateDockMap(spark, warehouse, imported)
        TableStore.write(
          StatusData.markLoaded(manifest, a.year.toInt, a.month.map(_.toInt)),
          warehouse, "StatusDataTable")
        // re-read: the old lineage points at the replaced files
        manifest = TableStore.read(spark, warehouse, "StatusDataTable")
      } finally imported.unpersist()
    }
    newOnes.size
  }

  private val monthNames = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** Recovery from a mid-archive crash (the failure model above): the
    * derived tables are reset and every loaded (year, month) partition
    * of the ImportedTrips fact table — itself crash-safe via dynamic
    * partition overwrite — is REPLAYED through the exact incremental
    * merge path, in chronological order. Replay (not a one-shot
    * rebuild) because DockTable's year totals are path-dependent by
    * reference semantics (`update_dockmap.py:224-236` replaces a
    * colliding year's totals with the latest delta's); a from-scratch
    * aggregate would "fix" numbers a clean incremental run reports
    * differently. The manifest is rebuilt in the reference's row shape
    * (last loaded month per year).
    *
    * Exact for monthly archive flows (the reference's normal
    * operation). A YEARLY archive originally merged all 12 months as
    * one delta; replay is per-month, so for such years the DockTable
    * year totals reflect the last month rather than the whole year,
    * and completeness cannot be reconstructed — recovered years are
    * marked incomplete. */
  def recover(spark: SparkSession, warehouse: String,
              provider: Waypoints.RouteProvider = Waypoints.StraightLineRoutes): Unit = {
    require(TableStore.exists(spark, warehouse, "ImportedTrips"),
      "cannot recover: no ImportedTrips fact table in this warehouse")
    val imported = TableStore.read(spark, warehouse, "ImportedTrips").cache()
    try {
      def reset(name: String, schema: StructType): Unit =
        TableStore.write(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
          warehouse, name)
      reset("LineGraphTable", lineGraphSchema)
      reset("HeatMapTable", heatMapSchema)
      reset("TripTable", tripTableSchema)
      reset("DockTable", dockTableSchema)
      // the period list is tiny (one row per loaded month) — driver loop
      val periods = imported.select(col("year"), col("month")).distinct()
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
        .sortBy { case (y, m) => (y.toInt, monthNames.indexOf(m)) }
      periods.foreach { case (y, m) =>
        val delta = imported
          .filter(col("year") === y && col("month") === m).cache()
        try {
          updateLineGraph(spark, warehouse, delta)
          updateHeatMap(spark, warehouse, delta)
          updateTripsMap(spark, warehouse, delta, provider)
          updateDockMap(spark, warehouse, delta)
        } finally delta.unpersist()
      }
      val monthNum = array_position(typedlit(monthNames), col("month"))
      val manifest = imported
        .select(col("year").cast("int").as("year"), monthNum.cast("int").as("m"))
        .groupBy("year").agg(max(col("m")).cast("int").as("month"))
        .select(col("year"), col("month"), lit(false).as("complete"))
      // re-impose the canonical manifest schema (nullability included)
      // so a recovered StatusDataTable is indistinguishable from one
      // written by markLoaded
      TableStore.write(
        spark.createDataFrame(manifest.rdd, StatusData.schema),
        warehouse, "StatusDataTable")
    } finally imported.unpersist()
  }

  private def updateLineGraph(spark: SparkSession, wh: String, imported: DataFrame): Unit =
    updateLineGraph(spark, wh, imported,
      TableStore.readOrEmpty(spark, wh, "LineGraphTable", lineGraphSchema))

  private def updateLineGraph(spark: SparkSession, wh: String, imported: DataFrame,
                              existing: DataFrame): Unit = {
    val merged = LineGraph.merge(existing, LineGraph.build(imported))
    TableStore.write(merged, wh, "LineGraphTable")
  }

  private def updateHeatMap(spark: SparkSession, wh: String, imported: DataFrame): Unit =
    updateHeatMap(spark, wh, imported,
      TableStore.readOrEmpty(spark, wh, "HeatMapTable", heatMapSchema))

  private def updateHeatMap(spark: SparkSession, wh: String, imported: DataFrame,
                            existing: DataFrame): Unit = {
    val merged = HeatMap.merge(existing, HeatMap.build(imported))
    TableStore.write(merged, wh, "HeatMapTable")
  }

  private def updateTripsMap(spark: SparkSession, wh: String, imported: DataFrame,
                             provider: Waypoints.RouteProvider): Unit =
    updateTripsMap(spark, wh, imported, provider,
      TableStore.readOrEmpty(spark, wh, "TripTable", tripTableSchema))

  private def updateTripsMap(spark: SparkSession, wh: String, imported: DataFrame,
                             provider: Waypoints.RouteProvider,
                             existing: DataFrame): Unit = {
    val merged = TripsMap.merge(existing, TripsMap.build(imported, provider))
    TableStore.write(merged, wh, "TripTable")
  }

  private def updateDockMap(spark: SparkSession, wh: String, imported: DataFrame): Unit =
    updateDockMap(spark, wh, imported,
      TableStore.readOrEmpty(spark, wh, "DockTable", dockTableSchema))

  private def updateDockMap(spark: SparkSession, wh: String, imported: DataFrame,
                            existing: DataFrame): Unit = {
    val merged = DockMap.merge(DockMap.fromStorage(existing), DockMap.build(imported))
    val out = DockMap.toStorage(merged)
    TableStore.write(out, wh, "DockTable")
  }
}
