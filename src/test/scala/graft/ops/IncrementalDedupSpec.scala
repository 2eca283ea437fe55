package graft.ops

import graft.SparkSpec

/** Incremental dedup: true dups never admitted; exact variant rescues
  * bloom false positives. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prefilter admits no true duplicate; exact variant equals anti-join") {
    val history = (0 until 2000).map(i => (i.toLong, s"historical doc number $i"))
      .toDF("doc_id", "text")
    // batch: 50 dups of history + 50 genuinely new
    val batch = ((0 until 50).map(i => (10000L + i, s"historical doc number ${i * 7}")) ++
      (0 until 50).map(i => (20000L + i, s"fresh doc $i")))
      .toDF("doc_id", "text")

    val probably = IncrementalDedup.probablyNewDocs(history, batch, 10000L, 0.03)
      .select("doc_id").as[Long].collect().toSet
    // no false negatives: every true dup excluded
    assert(probably.forall(_ >= 20000L))
    // fpp=3%: at most a few of the 50 new docs sacrificed
    assert(probably.size >= 45)

    val exact = IncrementalDedup.newDocsExact(history, batch, 10000L, 0.03)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == (0 until 50).map(i => 20000L + i).toSet) // exactly the new ones
  }

  test("newDocsExactDirect equals newDocsExact row-for-row, nulls and " +
    "hash-collision columns included — the small-history branch " +
    "StreamingDedup dispatches to") {
    val history = ((0 until 500).map(i => (i.toLong, s"historical doc $i")) :+
      (999L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val batch = ((0 until 20).map(i => (10000L + i, s"historical doc ${i * 3}")) ++
      (0 until 20).map(i => (20000L + i, s"fresh doc $i")) :+
      (30000L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val exact = IncrementalDedup.newDocsExact(history, batch, 10000L, 0.03)
      .orderBy("doc_id").collect().toSeq
    val direct = IncrementalDedup.newDocsExactDirect(history, batch)
      .orderBy("doc_id").collect().toSeq
    assert(direct === exact)
    // and both admit null-text rows (null equals nothing in history)
    assert(direct.exists(_.getLong(0) == 30000L))
  }
}
