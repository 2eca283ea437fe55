package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P1-P4 + S7: normalize a raw Citibike CSV batch (any historical header
  * generation) to the canonical 12-column schema.
  *
  * Reference behavior (`clean_up.py:44-74`): rename headers
  * (whitespace -> underscore, lowercase, synonym map), null-pad missing
  * canonical columns, project, cast. Timestamps parse via a
  * multi-format chain (`clean_up.py:47-52`).
  *
  * All column work is metadata-only or codegen'd expressions; nothing
  * here shuffles.
  */
object Normalize {

  /** `cleanup_columns` (`clean_up.py:71-74`). */
  def cleanColumnName(c: String): String = {
    val underscored = c.replaceAll("\\s", "_").toLowerCase
    TripSchema.renameMap.getOrElse(underscored, underscored)
  }

  /** Multi-format timestamp parse: first format that matches wins
    * (Arrow tries its parsers in order; ISO is its built-in default). */
  def parseTimestamp(c: Column): Column =
    coalesce(TripSchema.timestampFormats.map(f => try_to_timestamp(c, lit(f))): _*)

  private def castTo(c: Column, dt: DataType): Column = dt match {
    // raw CSV columns are strings; timestamps need the format chain
    case TimestampType => parseTimestamp(c)
    case other => c.cast(other)
  }

  /** Full normalization: rename -> null-pad -> project -> cast. */
  def apply(raw: DataFrame): DataFrame = {
    val renamed = raw.toDF(raw.columns.map(cleanColumnName).toIndexedSeq: _*)
    val present = renamed.columns.toSet
    val projected = TripSchema.canonical.fields.map { f =>
      if (present.contains(f.name)) castTo(col(f.name), f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    renamed.select(projected.toIndexedSeq: _*)
  }

  /** Cast-only step for inputs whose columns are already renamed and
    * null-padded to the canonical names (the distributed ingest path
    * renames headers executor-side). */
  def castCanonical(raw: DataFrame): DataFrame =
    raw.select(TripSchema.canonical.fields.map(f =>
      castTo(col(f.name), f.dataType).as(f.name)).toIndexedSeq: _*)
}
