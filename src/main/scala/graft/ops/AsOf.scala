package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and right.ts <= left.ts.
  *
  * Composed from built-ins per the extension preference order — a
  * union + sort + `last(ignoreNulls)` running window, NOT a range
  * cross-join: both sides shuffle once on the key, the within-partition
  * sort is linear, and no candidate pairs materialize. This is the
  * sort-merge formulation a native AsOfJoinExec would implement, so
  * there is nothing a custom SparkPlan would save; it also keeps
  * whole-stage codegen (window over sorted rows).
  *
  * Row-level semantics: the matched right ROW's payload is carried as
  * one struct, so a right row whose payload value is genuinely null
  * yields null (older rows are NOT consulted per-column), and multiple
  * payload columns always come from the same right row. Right rows with
  * a null key or null ts match nothing (ASOF `>=` never matches null),
  * mirroring SQL ASOF JOIN. Ties (right.ts == left.ts) match; callers
  * must make (key, ts) unique on the right side (e.g. aggregate first)
  * or the tie-winner is undefined in any engine.
  */
object AsOf {

  /** @param left       rows to enrich
    * @param right      (key, ts, payload...) lookup side, unique on (key, ts)
    * @param key        join key column name (present in both)
    * @param ts         event-time column name (present in both)
    * @param rightPayload right columns to carry (become nullable)
    * @param direction  "backward" (latest right.ts <= left.ts, the
    *                   default) or "forward" (earliest right.ts >=
    *                   left.ts) — pandas merge_asof's direction knob
    * @param toleranceMicros when set, a match farther than this from
    *                   left.ts yields nulls. Equivalent to restricting
    *                   candidates (the nearest match is checked first),
    *                   i.e. pandas merge_asof tolerance semantics. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String],
               direction: String = "backward",
               toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // the matched right row's ts travels inside the payload struct so
    // the tolerance check can compare against it after the fact
    val payloadStruct = struct(
      (col(ts).as("__rts") +: rightPayload.map(col)): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    // tag and align the two sides: side 0 sorts before side 1 at equal ts,
    // so a right row at exactly left.ts is visible to it. The payload
    // travels as ONE struct — non-null for every surviving right row —
    // so last(ignoreNulls) picks whole rows, never stitches columns.
    val r = right
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .select(
        (Seq(col(key), col(ts), lit(0).as("__side"),
          payloadStruct.as("__r")) ++
          leftCols.filterNot(c => c == key || c == ts)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val l = left.select(
      (Seq(col(key), col(ts), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__r")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
    // backward walks time ascending (latest prior row wins); forward
    // walks descending (earliest following row wins) — same running
    // last(ignoreNulls) either way, still one shuffle + one sort
    val ord = if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(key).orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    val matched = toleranceMicros match {
      case None => col("__asof")
      case Some(tol) =>
        val diff = abs(micros(col(ts), left.schema(ts).dataType) -
          micros(col("__asof").getField("__rts"),
            right.schema(ts).dataType))
        when(diff <= tol, col("__asof")) // else null: out-of-tolerance
    }
    carried.filter(col("__side") === 1)
      .withColumn("__m", matched)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col("__m").getField(c).as(s"asof_$c"))): _*)
  }

  /** Event time as comparable microseconds regardless of column type. */
  private def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
}
