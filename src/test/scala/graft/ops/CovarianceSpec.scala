package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed Gram aggregator (exactness + partitioning
  * invariance) and the driver-side Jacobi eigensolver contract. */
class CovarianceSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31)
  private val dim = 64
  private val scaleBits = 20
  private val scale = (1L << scaleBits).toDouble

  private def corpus(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))

  private def refGram(rows: Seq[(Long, Seq[Float])]): Map[(Int, Int), Long] = {
    val acc = scala.collection.mutable.Map.empty[(Int, Int), Long]
      .withDefaultValue(0L)
    rows.foreach { case (_, v) =>
      val x = v.map(_.toDouble)
      for (i <- 0 until dim; j <- i until dim)
        acc((i, j)) += math.floor(x(i) * x(j) * scale + 0.5).toLong
    }
    acc.toMap
  }

  test("gramFixedPoint equals the driver reference and is invariant " +
    "under repartitioning (order-independent integer sums)") {
    val rows = corpus(150)
    val expect = refGram(rows)
    for (parts <- Seq(1, 8)) {
      val got = Covariance.gramFixedPoint(
          rows.toDF("vec_id", "embedding").repartition(parts),
          dim, scaleBits)
        .collect().map(r => ((r.getInt(0), r.getInt(1)),
          (r.getLong(2), r.getLong(3)))).toMap
      assert(got.size == dim * (dim + 1) / 2)
      got.foreach { case ((i, j), (n, s)) =>
        assert(n == 150L)
        assert(s == expect((i, j)), s"entry ($i, $j) at parts=$parts")
      }
    }
  }

  test("eigenSym: reconstruction and orthonormality on a random " +
    "symmetric matrix; eigenvalues descending") {
    val d = 16
    val a = Array.tabulate(d, d)((_, _) => rnd.nextDouble() * 2 - 1)
    val sym = Array.tabulate(d, d)((i, j) => (a(i)(j) + a(j)(i)) / 2)
    val (vals, vecs) = Covariance.eigenSym(sym)
    assert(vals.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "eigenvalues not descending")
    // reconstruction: A ≈ Σ λ_k q_k q_kᵀ
    val rec = Array.ofDim[Double](d, d)
    for (k <- 0 until d; i <- 0 until d; j <- 0 until d)
      rec(i)(j) += vals(k) * vecs(k)(i) * vecs(k)(j)
    var err = 0.0; var nrm = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      err += math.pow(rec(i)(j) - sym(i)(j), 2)
      nrm += sym(i)(j) * sym(i)(j)
    }
    assert(math.sqrt(err / nrm) < 1e-7, s"reconstruction error $err")
    // orthonormality
    for (k <- 0 until d; l <- 0 until d) {
      val dot = (0 until d).map(i => vecs(k)(i) * vecs(l)(i)).sum
      val want = if (k == l) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"q$k · q$l = $dot")
    }
  }

  test("OPQ rotation: orthonormal, preserves exact L2 top-k, and lifts " +
    "ADC recall on anisotropic data") {
    // anisotropic corpus: 8 dominant directions at 10x the energy of
    // the remaining 56 — the regime where un-rotated subspaces starve
    val n = 400
    val rows = (0 until n).map { id =>
      val v = Array.tabulate(dim)(i =>
        (rnd.nextGaussian() * (if (i % 8 == 0) 10.0 else 1.0)).toFloat)
      (id.toLong, v.toSeq)
    }
    val d = rows.toDF("vec_id", "embedding")
    val cfg = Pq.PqConfig(m = 8, ksub = 16, bitsPerCode = 4, dim = dim)
    val r = Covariance.pcaRotationRR(d, cfg.m, dim, scaleBits)
    // orthonormality of the learned rotation
    for (k <- 0 until dim; l <- k until dim) {
      val dot = (0 until dim).map(i => r(k)(i) * r(l)(i)).sum
      val want = if (k == l) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"R row $k · row $l = $dot")
    }
    val rotated = d.select(col("vec_id"),
      graft.functions.VectorFunctions.matVec(col("embedding"), r)
        .as("embedding"))
    // rotation preserves exact L2 geometry: same top-k hit counts
    val exRaw = Pq.exactL2TopK(d, 20, 5)
      .select("query_id", "vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val exRot = Pq.exactL2TopK(rotated, 20, 5)
      .select("query_id", "vec_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert((exRaw & exRot).size >= (exRaw.size * 9) / 10,
      "orthonormal rotation should preserve nearly all exact top-k " +
        "(float noise may flip near-ties)")
    def recall(df: org.apache.spark.sql.DataFrame): Long =
      Pq.adcRecall(df, cfg, 20, 5).agg(sum(col("adc_hits")))
        .collect()(0).getLong(0)
    val raw = recall(d)
    val rot = recall(rotated)
    assert(rot > raw,
      s"rotated ADC recall $rot should beat raw $raw on anisotropic data")
    // the q99 operator composes the same comparison in one frame
    // (both hit counts against the unrotated exact baseline)
    val q99 = Pq.adcRecallRotated(d, cfg, r, 20, 5)
      .agg(sum(col("adc_hits")).as("u"), sum(col("rot_hits")).as("r"))
      .collect()(0)
    assert(q99.getLong(1) > q99.getLong(0),
      s"adcRecallRotated: rot_hits ${q99.getLong(1)} should beat " +
        s"adc_hits ${q99.getLong(0)} on anisotropic data")
    // and composed into the FULL serving path (q104's operator): the
    // rotated auto-sized IVF-PQ pipeline at an EQUAL candidate budget
    // (same nProbe, same shortlist) must not lose to the unrotated
    // one on this corpus — the whole point of carrying R into serving
    val serve = Pq.ivfPqRecallAutoRotated(d, cfg, r, nProbe = 2,
        nQueries = 20, k = 5, shortlist = 30)
      .agg(sum(col("ivfpq_hits")).as("u"), sum(col("rot_hits")).as("r"))
      .collect()(0)
    assert(serve.getLong(1) >= serve.getLong(0),
      s"ivfPqRecallAutoRotated: rot_hits ${serve.getLong(1)} below " +
        s"unrotated ${serve.getLong(0)} at equal candidates on " +
        "anisotropic data")
  }

  test("pcaRotationRRLocal is the bit-identical twin of the " +
    "distributed learner (the q99 oracle contract)") {
    // uniform corpus is fine here: the claim is exact-arithmetic
    // equality of the two learning paths, not rotation quality.
    // Fixed-point Gram/mean sums are integers (order-independent),
    // covariance assembly and Jacobi are the same driver code — so
    // the rotations must match to the BIT, which is what lets q99
    // embed the local R as oracle literals against a Spark-learned R.
    val rows = corpus(300)
    val local = Covariance.pcaRotationRRLocal(
      rows.map(_._2.toArray).toArray, m = 8, dim, scaleBits)
    val dist = Covariance.pcaRotationRR(
      rows.toDF("vec_id", "embedding"), m = 8, dim, scaleBits)
    assert(local.length == dist.length)
    for (i <- local.indices)
      assert(local(i).sameElements(dist(i)), s"rotation row $i differs")
  }

  test("covarianceMatrix is translation-invariant to quantization " +
    "tolerance (mean-free)") {
    val rows = corpus(100)
    val shifted = rows.map { case (id, v) => (id, v.map(x => x + 0.5f)) }
    def cov(rs: Seq[(Long, Seq[Float])]): Array[Array[Double]] = {
      val gram = Covariance.gramFixedPoint(rs.toDF("vec_id", "embedding"),
          dim, scaleBits)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getLong(3))).toSeq
      val mean = new Array[Long](dim)
      rs.foreach { case (_, v) =>
        for (i <- 0 until dim)
          mean(i) += math.floor(v(i).toDouble * scale + 0.5).toLong
      }
      Covariance.covarianceMatrix(gram, dim, mean, rs.size, scaleBits)
    }
    val c0 = cov(rows); val c1 = cov(shifted)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(math.abs(c0(i)(j) - c1(i)(j)) < 1e-3,
        s"covariance moved under translation at ($i, $j)")
  }
}
