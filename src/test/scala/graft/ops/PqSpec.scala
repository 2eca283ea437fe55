package graft.ops

import graft.SparkSpec
import graft.functions.{PqAdcScoreExpr, PqEncodeExpr, PqLutExpr}
import graft.functions.VectorFunctions.{pqAdcScore, pqEncode, pqLut}
import org.apache.spark.sql.functions._

/** Product quantization: codebook sampling, the three fused kernels
  * (encode / LUT / ADC score) on both codegen and interpreted paths,
  * and the end-to-end ADC top-k + recall semantics. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Pq.PqConfig(m = 8, ksub = 16, bitsPerCode = 4, dim = 64)
  private val rnd = new scala.util.Random(11)

  /** (vec_id, 64-dim float vector); ids 0..n-1. */
  private def corpus(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map(i => (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  /** Plain-Scala reference encode: first-wins argmin per subspace over
    * the c2 − 2·dot sequential fold, packed little-endian. */
  private def refEncode(v: Seq[Float],
                        cb: Array[Array[Array[Double]]]): Long = {
    val x = v.map(_.toDouble).padTo(cfg.dim, 0.0)
    var packed = 0L
    for (j <- 0 until cfg.m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      for (c <- cb(j).indices) {
        val cv = cb(j)(c)
        val c2 = cv.foldLeft(0.0)((a, t) => a + t * t)
        val dot = (0 until cfg.dsub).foldLeft(0.0)((a, i) =>
          a + x(j * cfg.dsub + i) * cv(i))
        val d = c2 - 2.0 * dot
        if (d < best) { best = d; bestC = c }
      }
      packed |= bestC.toLong << (cfg.bitsPerCode * j)
    }
    packed
  }

  private def refLut(v: Seq[Float],
                     cb: Array[Array[Array[Double]]]): Array[Double] = {
    val x = v.map(_.toDouble).padTo(cfg.dim, 0.0)
    val lut = new Array[Double](cfg.m * cfg.ksub)
    for (j <- 0 until cfg.m; c <- cb(j).indices) {
      val cv = cb(j)(c)
      val c2 = cv.foldLeft(0.0)((a, t) => a + t * t)
      val dot = (0 until cfg.dsub).foldLeft(0.0)((a, i) =>
        a + x(j * cfg.dsub + i) * cv(i))
      lut(j * cfg.ksub + c) = c2 - 2.0 * dot
    }
    lut
  }

  test("sampleCodebooks: ksub lowest-vec_id vectors, sliced per subspace") {
    val rows = corpus(40)
    val cb = Pq.sampleCodebooks(df(rows), cfg)
    assert(cb.length == cfg.m)
    assert(cb.forall(_.length == cfg.ksub))
    assert(cb.forall(_.forall(_.length == cfg.dsub)))
    // entry c of sub-codebook j is the j-th slice of sample vector c
    // (samples = the ksub lowest vec_ids, ascending)
    for (c <- 0 until cfg.ksub; j <- 0 until cfg.m) {
      val expect = rows(c)._2.map(_.toDouble)
        .slice(j * cfg.dsub, (j + 1) * cfg.dsub)
      assert(cb(j)(c).toSeq == expect,
        s"codebook entry (j=$j, c=$c) is not the sample slice")
    }
  }

  test("encode (codegen path) matches the plain-Scala argmin bit-for-bit") {
    val rows = corpus(120)
    val cb = Pq.sampleCodebooks(df(rows), cfg)
    val got = Pq.encode(df(rows), cb, cfg.bitsPerCode)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = rows.map { case (id, v) => (id, refEncode(v, cb)) }
    assert(got.toSeq == expect)
    // every unpacked code is a valid sub-codebook index
    val mask = (1L << cfg.bitsPerCode) - 1
    got.foreach { case (_, code) =>
      (0 until cfg.m).foreach { j =>
        val c = (code >>> (cfg.bitsPerCode * j)) & mask
        assert(c >= 0 && c < cfg.ksub)
      }
    }
  }

  test("interpreted eval paths (Expression.eval) match the references; nulls propagate") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val rows = corpus(30)
    val cb = Pq.sampleCodebooks(df(rows), cfg)
    val v = rows(23)._2
    val vLit = Literal.create(v, ArrayType(FloatType))

    val encGot = PqEncodeExpr(vLit, cb, cfg.bitsPerCode)
      .eval(null).asInstanceOf[Long]
    assert(encGot == refEncode(v, cb))

    val lutGot = PqLutExpr(vLit, cb).eval(null).asInstanceOf[ArrayData]
      .toDoubleArray()
    val lutRef = refLut(v, cb)
    assert(lutGot.length == lutRef.length)
    lutGot.zip(lutRef).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b))
    }

    val code = refEncode(v, cb)
    val scoreGot = PqAdcScoreExpr(
      Literal.create(lutRef.toSeq, ArrayType(DoubleType)),
      Literal.create(code, LongType),
      cfg.m, cfg.ksub, cfg.bitsPerCode).eval(null).asInstanceOf[Double]
    val mask = (1L << cfg.bitsPerCode) - 1
    val scoreRef = (0 until cfg.m).foldLeft(0.0)((acc, j) =>
      acc + lutRef(j * cfg.ksub + ((code >>> (cfg.bitsPerCode * j)) & mask).toInt))
    assert(java.lang.Double.doubleToLongBits(scoreGot) ==
      java.lang.Double.doubleToLongBits(scoreRef))

    val nullVec = Literal.create(null, ArrayType(FloatType))
    assert(PqEncodeExpr(nullVec, cb, cfg.bitsPerCode).eval(null) == null)
    assert(PqLutExpr(nullVec, cb).eval(null) == null)
    assert(PqAdcScoreExpr(Literal.create(null, ArrayType(DoubleType)),
      Literal.create(code, LongType),
      cfg.m, cfg.ksub, cfg.bitsPerCode).eval(null) == null)
  }

  test("ADC score via DataFrame equals LUT-fold reference (codegen path)") {
    val rows = corpus(80)
    val cb = Pq.sampleCodebooks(df(rows), cfg)
    val q = rows(3)._2
    val lutRef = refLut(q, cb)
    val mask = (1L << cfg.bitsPerCode) - 1
    val got = Pq.encode(df(rows), cb, cfg.bitsPerCode)
      .withColumn("lut", pqLut(
        typedLit(q), cb))
      .select(col("vec_id"), col("pq_code"),
        pqAdcScore(col("lut"), col("pq_code"),
          cfg.m, cfg.ksub, cfg.bitsPerCode).as("score"))
      .orderBy("vec_id").collect()
    got.foreach { r =>
      val code = r.getLong(1)
      val expect = (0 until cfg.m).foldLeft(0.0)((acc, j) =>
        acc + lutRef(j * cfg.ksub +
          ((code >>> (cfg.bitsPerCode * j)) & mask).toInt))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(expect),
        s"vec ${r.getLong(0)}")
    }
  }

  test("an exact duplicate encodes to identical codes and is both the " +
    "exact and the ADC top-1 of its original") {
    val base = corpus(60)
    val nQ = 5
    // plant an exact copy of each query vector at a high id
    val planted = base ++ (0 until nQ).map(i =>
      (1000L + i, base(i)._2))
    val d = df(planted)
    val cb = Pq.sampleCodebooks(d, cfg)
    val codes = Pq.encode(d, cb, cfg.bitsPerCode).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until nQ).foreach(i => assert(codes(i.toLong) == codes(1000L + i)))

    val ex = Pq.exactL2TopK(d, nQ, 3).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val adc = Pq.adcTopK(d, cfg, nQ, 3).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until nQ).foreach { i =>
      assert(ex(i.toLong) == 1000L + i, s"exact top-1 of query $i")
      assert(adc(i.toLong) == 1000L + i, s"ADC top-1 of query $i")
    }

    val recall = Pq.adcRecall(d, cfg, nQ, 3).collect()
    assert(recall.length == nQ)
    recall.foreach { r =>
      assert(r.getLong(1) == 3)              // exact_k
      assert(r.getLong(2) >= 1, s"query ${r.getLong(0)}: the planted " +
        "duplicate must be an ADC hit")
    }
  }

  test("two-stage rerank: duplicate stays top-1, recall dominates ADC-only") {
    val base = corpus(60)
    val nQ = 5
    val planted = base ++ (0 until nQ).map(i => (1000L + i, base(i)._2))
    val d = df(planted)
    val rr = Pq.adcRerankTopK(d, cfg, nQ, k = 3, shortlist = 15)
    val top1 = rr.filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until nQ).foreach(i => assert(top1(i.toLong) == 1000L + i,
      s"rerank top-1 of query $i must be its exact duplicate"))
    // widening the shortlist can only help: per query, rerank hits
    // >= ADC-only hits (the rerank of shortlist>=k exact-scores a
    // superset of what ADC-only would return)
    val adcHits = Pq.adcRecall(d, cfg, nQ, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rrHits = Pq.adcRerankRecall(d, cfg, nQ, 3, shortlist = 15).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until nQ).foreach { i =>
      assert(rrHits(i.toLong) >= adcHits(i.toLong),
        s"query $i: rerank recall below ADC-only")
    }
    intercept[IllegalArgumentException](
      Pq.adcRerankTopK(d, cfg, nQ, k = 5, shortlist = 3))
  }

  test("IVF-PQ: planted duplicate survives cell probing, shortlist and " +
    "rerank to stay top-1; recall never exceeds exact_k") {
    val base = corpus(60)
    val nQ = 5
    val planted = base ++ (0 until nQ).map(i => (1000L + i, base(i)._2))
    val d = df(planted)
    // an exact duplicate lands in the same argmin cell as its query
    // (identical distances, same tie-break), encodes to the same
    // codes (minimal possible ADC score for that query), and has
    // exact distance -|q|^2 (the unique minimum) — so it must come
    // through all three stages as top-1
    val top1 = Pq.ivfPqTopK(d, cfg, cellSize = 8, nProbe = 2, nQ,
        k = 3, shortlist = 10)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until nQ).foreach(i => assert(top1(i.toLong) == 1000L + i,
      s"IVF-PQ top-1 of query $i must be its exact duplicate"))
    val recall = Pq.ivfPqRecall(d, cfg, cellSize = 8, nProbe = 2, nQ,
      k = 3, shortlist = 10).collect()
    assert(recall.length == nQ)
    recall.foreach { r =>
      assert(r.getLong(1) == 3)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1),
        s"query ${r.getLong(0)}: hits out of range")
    }
  }

  test("persisted IVF-PQ index serves identically to the direct path") {
    val base = corpus(80)
    val nQ = 4
    val planted = base ++ (0 until nQ).map(i => (1000L + i, base(i)._2))
    val d = df(planted)
    val wh = tmpDir("pq-index-wh")
    val idx = Pq.buildIvfPqIndex(d, cfg, cellSize = 8, wh, "pqcells",
      nBuckets = 4)
    val direct = Pq.ivfPqTopK(d, cfg, cellSize = 8, nProbe = 2, nQ,
      k = 3, shortlist = 10).orderBy("query_id", "rank").collect()
    val served = Pq.ivfPqTopKFromIndex(spark.table(idx), d, cfg,
      cellSize = 8, nProbe = 2, nQ, k = 3, shortlist = 10)
      .orderBy("query_id", "rank").collect()
    assert(direct.map(_.toString).toSeq == served.map(_.toString).toSeq,
      "indexed serving diverges from the direct path")
    assert(direct.nonEmpty)
  }

  test("config guards: indivisible dim, overflowing pack, oversized ksub") {
    intercept[IllegalArgumentException](Pq.PqConfig(m = 7, dim = 64))
    intercept[IllegalArgumentException](          // 8 x 8 = 64 bits: sign bit
      Pq.PqConfig(m = 8, ksub = 16, bitsPerCode = 8, dim = 64))
    intercept[IllegalArgumentException](
      Pq.PqConfig(m = 8, ksub = 17, bitsPerCode = 4, dim = 64))
  }
}
