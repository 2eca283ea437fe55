package graft.ops

import graft.SparkSpec

/** [[TextAnalysis.crossEntropySelect]] — hand-worked integer-bits
  * cross-entropy difference at a collision-free bucket width, the
  * signed-division keep law, and the target flag. */
class CeSelectSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("target-like docs score 0 and keep, off-target docs score " +
    "positive and drop; hand-worked bits at B = 2^20") {
    val sp = spark
    import sp.implicits._
    // target slice: one src0 doc, 4 'aaa' tokens; raw-only: 8 docs of
    // 4 'zzz'. T_t = 4, T_r = 36.
    //   aaa: bits_t = ⌊log2((4+B) div 5)⌋ = 17 = bits_r((36+B) div 5)
    //        → diff 0
    //   zzz: bits_t = ⌊log2((4+B) div 1)⌋ = 20,
    //        bits_r = ⌊log2((36+B) div 33)⌋ = 14 → diff +6/token
    val docs = (Seq((0L, "aaa aaa aaa aaa", "src0")) ++
      (1L to 8L).map(i => (i, "zzz zzz zzz zzz", "src1")))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.crossEntropySelect(docs,
        col("source") === "src0", buckets = 1 << 20, thetaX1000 = 0L)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.head === (0L, true, 4L, 0L, true))
    assert(got.tail.forall { case (_, t, n, d, k) =>
      !t && n == 4L && d == 6000L && !k })
  }

  test("matches a sequential reference implementation exactly at a " +
    "collision-heavy bucket width (B = 8), including the signed " +
    "truncating division and the keep law") {
    val sp = spark
    import sp.implicits._
    val pool = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val texts = (0 until 20).map { i =>
      (0 to i % 7).map(j => pool((i * 3 + j * 5) % pool.size))
        .mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, if (i < 5) "src0" else "src1") }
      .toDF("doc_id", "text", "source")
    val bCount = 8
    // sequential reference over the same h60 bucketing
    val tokOf = (t: String) => t.trim.toLowerCase.split("\\s+").toSeq
    val bucket = (t: String) =>
      java.lang.Math.floorMod(Hashing.h60Scala(t), bCount.toLong)
    val all = texts.zipWithIndex.flatMap { case (t, i) =>
      tokOf(t).map(w => (i, bucket(w))) }
    val cR = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cT = all.filter(_._1 < 5).groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val (tR, tT) = (all.size.toLong, all.count(_._1 < 5).toLong)
    def bits(tot: Long, c: Long): Long =
      63 - java.lang.Long.numberOfLeadingZeros((tot + bCount) / (c + 1))
    val want = texts.zipWithIndex.map { case (t, i) =>
      val bs = tokOf(t).map(bucket)
      val dsum = bs.map(b =>
        bits(tT, cT.getOrElse(b, 0L)) - bits(tR, cR(b))).sum
      val diff = 1000L * dsum / bs.size  // JVM / truncates like both engines
      (i.toLong, i < 5, bs.size.toLong, diff, diff <= 0L)
    }
    val got = TextAnalysis.crossEntropySelect(docs,
        col("source") === "src0", buckets = bCount, thetaX1000 = 0L)
      .orderBy("doc_id").collect().toSeq
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got === want)
  }
}
