package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver testdata layout
  * (`TESTDATA.md`: one parquet file per table under the sf dir).
  *
  * At cluster scale the same entry point would read a partitioned
  * directory tree (e.g. `.../events/year=2024/...`) and Catalyst
  * partition pruning + parquet filter pushdown apply unchanged —
  * callers must always `select`/`filter` before wide operations so
  * pushdown reaches the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a table with a parallelism floor: when the planned scan has
    * fewer input splits than the session has cores, repartition by
    * `key` up to the core count before returning it.
    *
    * The driver's test files are single-file single-row-group parquet,
    * so their scan plans exactly ONE split — and every narrow stage
    * above it (shingling, minhash signatures, vector math) runs on one
    * thread while 31 cores idle; measured 2x on the LSH dedup kernel
    * at sf0.1. On a cluster a large scan already plans >= cores splits,
    * the condition is false, and no shuffle is ever inserted — this is
    * strictly a floor, never a cap. The explicit partition count keeps
    * AQE from coalescing the floor back down (REPARTITION_BY_NUM is
    * exempt from coalescing; a bare `repartition(col)` is not).
    */
  def floored(spark: SparkSession, sfDir: String, name: String, key: String): DataFrame = {
    val df = apply(spark, sfDir, name)
    val cores = spark.sparkContext.defaultParallelism
    // probe planned splits via the already-compiled physical plan's
    // internal-row RDD: `df.rdd` would wrap the query in a fresh
    // row-deserializer plan and compile it once per table read, only
    // to ask for a partition count
    val splits = df.queryExecution.toRdd.getNumPartitions
    if (splits < cores) df.repartition(cores, col(key)) else df
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet's ts has shipped in two physical forms across
    // driver testdata generations: TIMESTAMP(NANOS), which Spark 4
    // rejects outright (read nanos as raw long, truncate to micros —
    // exactly what DuckDB's ns->us read does), and
    // TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark would
    // read as TIMESTAMP_NTZ — breaking every long-cast/unix_micros
    // downstream (q41/q48 failed SILENTLY for part of round 10: the
    // per-query catch in Verify ate the AnalysisException and the
    // local checker counted only present results — both hardened
    // since). Disabling NTZ inference reads micros-no-tz as plain
    // TIMESTAMP; with the session pinned UTC the raw epoch micros are
    // identical to DuckDB's naive read, matching the nanos-era
    // semantics bit-for-bit.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
