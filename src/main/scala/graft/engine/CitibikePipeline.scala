package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def updateLineGraph(spark: SparkSession, wh: String,
                              imported: DataFrame): Unit = {
    val existing = TableStore.readOrEmpty(spark, wh, "LineGraphTable", lineGraphSchema)
    val merged = LineGraph.merge(existing, LineGraph.build(imported))
    TableStore.write(merged, wh, "LineGraphTable")
  }

  private def updateHeatMap(spark: SparkSession, wh: String,
                            imported: DataFrame): Unit = {
    val existing = TableStore.readOrEmpty(spark, wh, "HeatMapTable", heatMapSchema)
    val merged = HeatMap.merge(existing, HeatMap.build(imported))
    TableStore.write(merged, wh, "HeatMapTable")
  }

  private def updateTripsMap(spark: SparkSession, wh: String,
                             imported: DataFrame,
                             provider: Waypoints.RouteProvider): Unit = {
    val existing = TableStore.readOrEmpty(spark, wh, "TripTable", tripTableSchema)
    val merged = TripsMap.merge(existing, TripsMap.build(imported, provider))
    TableStore.write(merged, wh, "TripTable")
  }

  private def updateDockMap(spark: SparkSession, wh: String,
                            imported: DataFrame): Unit = {
    val existing = DockMap.fromStorage(
      TableStore.readOrEmpty(spark, wh, "DockTable", dockTableSchema))
    val merged = DockMap.merge(existing, DockMap.build(imported))
    val out = DockMap.toStorage(merged)
    TableStore.write(out, wh, "DockTable")
  }
}
