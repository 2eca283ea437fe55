package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Count-Min Sketch invariants, hand-checkable ends of the accuracy
  * spectrum, and the no-underestimate guarantee on a mixed corpus. */
class SketchesSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val corpus = Seq(
    0L -> "a a a b c",
    1L -> "b c d d d d",
    2L -> "e f g a")
  // token counts: a=4 b=2 c=2 d=4 e=1 f=1 g=1, total 15

  test("width 1 collapses every token to the total stream count") {
    val out = Sketches.cmsEstimates(docs(corpus: _*),
      Seq("a", "d", "zz"), depth = 3, width = 1).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getLong(2) === 15L, s"width-1 estimate must be N: $r")
      assert(r.getBoolean(3))
    }
  }

  test("a wide sketch with no collisions is exact; absent tokens " +
    "estimate from empty buckets") {
    val out = Sketches.cmsEstimates(docs(corpus: _*),
      Seq("a", "b", "d", "g", "zz"), depth = 4, width = 1 << 16)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("a") === ((4L, 4L, true)))
    assert(out("b") === ((2L, 2L, true)))
    assert(out("d") === ((4L, 4L, true)))
    assert(out("g") === ((1L, 1L, true)))
    // 7 tokens in 65536 buckets: every probe row of the absent token
    // lands in an empty cell with near-certainty (verified fixed seed)
    assert(out("zz") === ((0L, 0L, true)))
  }

  test("no_underestimate holds at a collision-forcing width for every " +
    "vocabulary token") {
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "absent1", "absent2")
    val out = Sketches.cmsEstimates(docs(corpus: _*), vocab,
      depth = 4, width = 4).collect()
    assert(out.length === vocab.length)
    out.foreach { r =>
      assert(r.getBoolean(3), s"CMS underestimated: $r")
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("cmsMerge is exactly distributive: per-shard sketches fold to " +
    "the whole-corpus sketch bit-for-bit") {
    val all = docs(corpus: _*)
    val parts = Seq(
      all.filter(col("doc_id") < 1L),
      all.filter(col("doc_id") === 1L),
      all.filter(col("doc_id") > 1L))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val merged = Sketches.cmsMerge(
      parts.map(Sketches.cmsSketch(_, depth = 4, width = 8)): _*)
    val whole = Sketches.cmsSketch(all, depth = 4, width = 8)
    assert(cells(merged) === cells(whole))
  }

  test("the sketch itself is bounded by depth x width cells") {
    val sk = Sketches.cmsSketch(docs(corpus: _*), depth = 4, width = 4)
      .collect()
    assert(sk.length <= 16)
    // every token instance lands once per row: each row's counts sum to N
    assert(sk.groupBy(_.getLong(0)).values
      .forall(_.map(_.getLong(2)).sum === 15L))
  }
}
