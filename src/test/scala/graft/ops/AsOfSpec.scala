package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: row-level matching, null payloads, null
  * keys/timestamps, exact-tie behavior. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matched right ROW wins whole — null payload values are NOT skipped") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option(5.0), Option("a")),
      (1L, ts("2024-01-01 11:00:00"), None, Option("b")))
      .toDF("k", "t", "v", "tag")
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "L1"))
      .toDF("k", "t", "name")
    val r = AsOf.asofJoin(left, right, "k", "t", Seq("v", "tag")).collect()(0)
    // the 11:00 row matches; its v is genuinely null and must stay null
    // (per-column carry would wrongly resurrect 5.0 from 10:00)
    assert(r.isNullAt(r.fieldIndex("asof_v")))
    assert(r.getAs[String]("asof_tag") == "b") // same row's tag
  }

  test("null right key/ts match nothing; exact tie matches; no prior row -> null") {
    val right = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 1.0),
      (None, Some(ts("2024-01-01 09:00:00")), 2.0),   // null key: invisible
      (Some(2L), None, 3.0))                           // null ts: invisible
      .toDF("k", "t", "v")
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "tie"),   // ts == right.ts -> matches
      (1L, ts("2024-01-01 09:00:00"), "early"), // before any right -> null
      (2L, ts("2024-01-01 12:00:00"), "k2"))    // only null-ts right row -> null
      .toDF("k", "t", "name")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getAs[String]("name") ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None else Some(r.getDouble(r.fieldIndex("asof_v")))))
      .toMap
    assert(out("tie").contains(1.0))
    assert(out("early").isEmpty)
    assert(out("k2").isEmpty)
  }
}
