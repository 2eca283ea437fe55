package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-backed warehouse tables with write-temp-then-swap updates.
  *
  * The reference mutates one DuckDB file in place; over immutable
  * Parquet every merge rewrites the table, so writes go to a temp dir
  * and swap in atomically-per-rename (SURVEY §3.3). Readers of the old
  * snapshot in the same job must materialize before the swap — the
  * pipeline merges then writes, so the read plan is consumed first.
  */
object TableStore {

  def tablePath(warehouse: String, name: String): String = s"$warehouse/$name"

  def exists(spark: SparkSession, warehouse: String, name: String): Boolean = {
    val p = new Path(tablePath(warehouse, name))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def read(spark: SparkSession, warehouse: String, name: String): DataFrame = {
    // partition columns (year=/month= dirs) must stay strings — the
    // default type inference would turn year="2021" into an int
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    spark.read.parquet(tablePath(warehouse, name))
  }

  /** Append into a (possibly partitioned) table — the canonical-trips
    * fact table grows per archive; partitioning by (year, month) gives
    * partition pruning on every per-period query and makes re-load of a
    * period an overwrite of just its directories. */
  def append(df: DataFrame, warehouse: String, name: String,
             partitionBy: Seq[String]): Unit = {
    val w = if (partitionBy.nonEmpty) df.write.partitionBy(partitionBy: _*)
            else df.write
    w.mode("append").parquet(tablePath(warehouse, name))
  }

  def readOrEmpty(spark: SparkSession, warehouse: String, name: String,
                  schema: StructType): DataFrame =
    if (exists(spark, warehouse, name)) read(spark, warehouse, name)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Overwrite `name` with `df` via temp-dir + rename swap. Caller must
    * ensure `df` does not lazily read the table being replaced without
    * a barrier — pass `materialize = true` (default) to force the plan
    * into the temp files before the old dir is removed (it does: the
    * temp write IS the materialization; the swap happens after). */
  def write(df: DataFrame, warehouse: String, name: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$warehouse/.tmp_$name")
    val dst = new Path(tablePath(warehouse, name))
    val writer = if (partitionBy.nonEmpty)
      df.write.partitionBy(partitionBy: _*) else df.write
    writer.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
  }
}
