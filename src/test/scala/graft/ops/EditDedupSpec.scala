package graft.ops

import graft.SparkSpec
import graft.engine.Tables

/** [[Dedup.editVerifiedPairs]] / [[Dedup.minhashCandidatesCapped]] —
  * hand-worked banded Levenshtein verification and the candidate ⊇
  * verified recall contract against the Jaccard-verified path. */
class EditDedupSpec extends SparkSpec {

  test("editVerifiedPairs: hand-worked distances, band drop at " +
    "maxDist, identical texts at sim 1000") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      0L -> "kitten", 1L -> "sitting", // dist 3
      2L -> "flaw", 3L -> "lawn",      // dist 2
      4L -> "aaaa", 5L -> "zzzz",      // dist 4 — past the band
      6L -> "same", 7L -> "same")      // dist 0
      .toDF("doc_id", "text")
    val cand = Seq((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.editVerifiedPairs(docs, cand, maxDist = 3)
      .orderBy("doc_a").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // edit_sim_x1000 = 1000 − (1000·dist) div max(n_a, n_b, 1):
    //   kitten/sitting: 1000 − 3000 div 7 = 572
    //   flaw/lawn:      1000 − 2000 div 4 = 500
    //   same/same:      1000
    assert(got === Seq(
      (0L, 1L, 6L, 7L, 3L, 572L),
      (2L, 3L, 4L, 4L, 2L, 500L),
      (6L, 7L, 4L, 4L, 0L, 1000L)))
  }

  test("the byte-dispatched pairing branches are row-for-row identical " +
    "(forced shuffle-hash vs the broadcast fast path)") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(0L -> "kitten", 1L -> "sitting", 2L -> "flaw",
      3L -> "lawn", 6L -> "same", 7L -> "same").toDF("doc_id", "text")
    val cand = Seq((0L, 1L), (2L, 3L), (6L, 7L)).toDF("doc_a", "doc_b")
    // duplicate candidate pairs must replicate IDENTICALLY in both
    // branches (a per-pair b-side frame would emit n×m copies in the
    // shuffle branch where the broadcast branch emits n)
    val candDup = cand.union(cand.limit(1))
    val prev = spark.conf.getOption("graft.edit.broadcastMaxTextBytes")
    try {
      val fast = Dedup.editVerifiedPairs(docs, candDup, maxDist = 3)
        .orderBy("doc_a").collect().toSeq.map(_.toString)
      spark.conf.set("graft.edit.broadcastMaxTextBytes", "0")
      val slow = Dedup.editVerifiedPairs(docs, candDup, maxDist = 3)
        .orderBy("doc_a").collect().toSeq.map(_.toString)
      assert(fast === slow)
      assert(fast.nonEmpty)
      // the probe-skipping hint overrides a zero budget (it pins the
      // broadcast branch WITHOUT the byte-measuring aggregate job) and
      // still returns the identical rows
      spark.conf.set("graft.edit.assumeBroadcastFits", "true")
      try {
        val hinted = Dedup.editVerifiedPairs(docs, candDup, maxDist = 3)
          .orderBy("doc_a").collect().toSeq.map(_.toString)
        assert(hinted === fast)
      } finally spark.conf.unset("graft.edit.assumeBroadcastFits")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.edit.broadcastMaxTextBytes", v)
      case None => spark.conf.unset("graft.edit.broadcastMaxTextBytes")
    }
  }

  test("minhashCandidatesCapped is a superset of the Jaccard-verified " +
    "pair set at the same cap (the recall contract a different " +
    "verifier inherits)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val verified = Dedup.minhashDupPairsCapped(docs, 0.8, maxBucket = 16)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidatesCapped(docs, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "fixture lost its near-dup pairs")
    assert(verified.subsetOf(cand),
      s"${(verified -- cand).take(3)} verified pairs missing from candidates")
  }
}
