package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed second-moment (Gram) matrix of the embedding corpus —
  * the input every linear preprocessing step of a vector pipeline
  * needs: PCA, whitening, and the rotation OPQ (optimized product
  * quantization, Ge et al. 2013) applies before [[Pq]] coding to
  * balance per-subspace variance.
  *
  * Scale design: the natural shape is a fold with d·(d+1)/2 longs of
  * state per task — NOT an n·d² explode. A typed [[Aggregator]]
  * accumulates the upper triangle in a primitive array per partition
  * and merges element-wise, so the one exchange carries
  * (#partitions)·2080 longs at d=64, corpus size nowhere. (An
  * explode+groupBy formulation shuffles the same bounded state after
  * map-side combine but pays an n·2080-row generate first; the
  * Aggregator skips the row inflation entirely.)
  *
  * Determinism / oracle parity (the q82 fixed-point discipline): a
  * double-summed Gram entry depends on partial-aggregation order and
  * can never hash-match; instead each per-vector product quantizes to
  * `floor(v_i·v_j·2^scaleBits + 0.5)` (exact IEEE: float→double
  * widening, one multiply, one power-of-two scale, floor) and the
  * LONG sums are associative in any order — so the matrix replays
  * exactly in SQL however Spark partitions the fold. At scaleBits=20
  * the quantization noise per entry is ≤ 2^-21·n — four orders below
  * float32 input resolution for unit-scale embeddings — and overflow
  * needs Σ|v_i·v_j| > 2^43, i.e. ~10^13 unit-scale vectors in one
  * entry.
  *
  * [[eigenSym]] then runs a deterministic cyclic Jacobi sweep on the
  * driver — d×d state (64×64 doubles = 32 KB), the same
  * constant-size-artifact argument as the PQ codebooks — giving the
  * orthonormal basis OPQ/PCA/whitening consume. The eigensolver is
  * plain Scala (no SQL twin exists), so its contract is spec-pinned:
  * Q·Λ·Qᵀ reconstructs the input and QᵀQ = I to float tolerance.
  */
object Covariance {

  /** Upper-triangle index of (i, j), i <= j < d. */
  private def tri(i: Int, j: Int, d: Int): Int =
    i * d - (i * (i - 1)) / 2 + (j - i)

  private final class GramAgg(dim: Int, scale: Double)
      extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
    private val len = dim * (dim + 1) / 2
    def zero: Array[Long] = new Array[Long](len)
    def reduce(acc: Array[Long], v: Seq[Float]): Array[Long] = {
      val x = new Array[Double](dim)
      val n = math.min(v.length, dim)
      var i = 0
      while (i < n) { x(i) = v(i).toDouble; i += 1 }
      var a = 0
      var idx = 0
      while (a < dim) {
        var b = a
        while (b < dim) {
          acc(idx) += math.floor(x(a) * x(b) * scale + 0.5).toLong
          idx += 1; b += 1
        }
        a += 1
      }
      acc
    }
    def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { l(i) += r(i); i += 1 }
      l
    }
    def finish(acc: Array[Long]): Array[Long] = acc
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The fixed-point Gram upper triangle:
    * (i, j, n_vec, s_fp) for 0 <= i <= j < dim, where
    * s_fp = Σ_vec floor(v_i·v_j·2^scaleBits + 0.5). One row per
    * triangle entry — d·(d+1)/2 rows total, whatever the corpus. */
  def gramFixedPoint(embeddings: DataFrame, dim: Int = 64,
                     scaleBits: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val scale = (1L << scaleBits).toDouble
    val agg = new GramAgg(dim, scale).toColumn
    val vecs = embeddings.select(col("embedding")).as[Seq[Float]]
    val n = embeddings.count()
    val one = vecs.select(agg.name("g")).withColumn("n_vec", lit(n))
    one.select(posexplode(col("g")).as(Seq("idx", "s_fp")), col("n_vec"))
      .select(col("idx"), col("s_fp"), col("n_vec"))
      .withColumn("i", triRowExpr(dim))
      .withColumn("j", col("idx") - triBaseExpr(dim) + col("i"))
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        col("n_vec"), col("s_fp"))
      .orderBy("i", "j")
  }

  // idx -> row i: the largest i with base(i) <= idx, where
  // base(i) = i*d - i*(i-1)/2. dim is tiny, so a chained CASE is fine
  // and keeps the mapping in one pushed projection.
  private def triRowExpr(dim: Int) = {
    val bases = (0 until dim).map(i => i * dim - (i * (i - 1)) / 2)
    bases.zipWithIndex.reverse.tail.foldLeft(
      when(col("idx") >= bases.last, lit(dim - 1))) {
      case (acc, (base, i)) =>
        acc.when(col("idx") >= base, lit(i))
    }
  }

  private def triBaseExpr(dim: Int) = {
    val bases = (0 until dim).map(i => i * dim - (i * (i - 1)) / 2)
    bases.zipWithIndex.reverse.tail.foldLeft(
      when(col("i") === dim - 1, lit(bases.last))) {
      case (acc, (base, i)) => acc.when(col("i") === i, lit(base))
    }
  }

  /** Deterministic symmetric eigendecomposition (cyclic Jacobi with a
    * fixed sweep order) of a d×d matrix — driver-side, constant
    * state. Returns (eigenvalues descending, eigenvectors as rows,
    * aligned with the values). Convergence: off-diagonal Frobenius
    * mass < 1e-12·‖A‖ or 64 sweeps. */
  def eigenSym(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val q = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- 0 until d if i != j) s += m(i)(j) * m(i)(j)
      s
    }
    val norm = math.max(1e-300, a.map(_.map(x => x * x).sum).sum)
    var sweep = 0
    while (sweep < 64 && off() > 1e-24 * norm) {
      for (p <- 0 until d - 1; qi <- p + 1 until d if m(p)(qi) != 0.0) {
        val app = m(p)(p); val aqq = m(qi)(qi); val apq = m(p)(qi)
        val theta = 0.5 * math.atan2(2.0 * apq, aqq - app)
        val c = math.cos(theta); val s = math.sin(theta)
        for (k <- 0 until d) {
          val mkp = m(k)(p); val mkq = m(k)(qi)
          m(k)(p) = c * mkp - s * mkq
          m(k)(qi) = s * mkp + c * mkq
        }
        for (k <- 0 until d) {
          val mpk = m(p)(k); val mqk = m(qi)(k)
          m(p)(k) = c * mpk - s * mqk
          m(qi)(k) = s * mpk + c * mqk
        }
        for (k <- 0 until d) {
          val qkp = q(k)(p); val qkq = q(k)(qi)
          q(k)(p) = c * qkp - s * qkq
          q(k)(qi) = s * qkp + c * qkq
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -m(i)(i))
    (order.map(i => m(i)(i)).toArray,
      order.map(i => (0 until d).map(k => q(k)(i)).toArray).toArray)
  }

  /** Fixed-point per-dimension sums (for the mean): one row of dim
    * longs — same exactness discipline as [[gramFixedPoint]]. */
  def meanFixedPoint(embeddings: DataFrame, dim: Int = 64,
                     scaleBits: Int = 20): Array[Long] = {
    val scale = (1L << scaleBits).toDouble
    val sums = embeddings
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(floor(col("x").cast("double") * scale + 0.5).cast("long"))
        .as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Array.tabulate(dim)(i => sums.getOrElse(i, 0L))
  }

  /** OPQ-style rotation via eigenvalue allocation (the non-parametric
    * OPQ initialization of Ge et al. 2013): PCA eigenvectors are dealt
    * ROUND-ROBIN by descending eigenvalue across the m subspaces, so
    * every subspace receives a comparable share of the corpus variance
    * — plain PCA ordering would pile all the energy into the first
    * subspace and starve the rest, which is exactly what caps PQ
    * recall on anisotropic data. Returns the d×d rotation R (rows =
    * reordered eigenvectors): apply `matVec(embedding, R)` before
    * [[Pq]] coding; R is orthonormal, so exact L2 geometry — and the
    * exact top-k — is preserved.
    *
    * Driver cost: one [[gramFixedPoint]] pass + one
    * [[meanFixedPoint]] pass + a 64×64 Jacobi — all bounded state.
    * The rotation is a learned artifact (like trained codebooks): it
    * pins to the corpus it was derived from and has no SQL twin, so
    * rotated-PQ paths are spec-verified rather than oracle rows. */
  def pcaRotationRR(embeddings: DataFrame, m: Int, dim: Int = 64,
                    scaleBits: Int = 20): Array[Array[Double]] = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val n = embeddings.count()
    require(n > 0, "empty corpus")
    val gram = gramFixedPoint(embeddings, dim, scaleBits)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    val mean = meanFixedPoint(embeddings, dim, scaleBits)
    val cov = covarianceMatrix(gram, dim, mean, n, scaleBits)
    rrFromCovariance(cov, m, dim)
  }

  /** The eigendecompose + round-robin-allocate tail shared by the
    * distributed ([[pcaRotationRR]]) and local ([[pcaRotationRRLocal]])
    * learners: deal eigvec k (variance rank k) to subspace k % m, so
    * subspace j's rows are its dealt vectors in rank order. */
  private def rrFromCovariance(cov: Array[Array[Double]], m: Int,
                               dim: Int): Array[Array[Double]] = {
    val (_, vecs) = eigenSym(cov)   // rows = eigenvectors, descending
    val dsub = dim / m
    val order = Array.ofDim[Int](dim)
    val counts = new Array[Int](m)
    for (k <- 0 until dim) {
      val j = k % m
      order(j * dsub + counts(j)) = k
      counts(j) += 1
    }
    order.map(vecs(_))
  }

  /** Plain-Scala twin of [[pcaRotationRR]] over an in-memory float
    * corpus: the SAME fixed-point Gram and mean sums ([[GramAgg]]'s
    * exact arithmetic — float→double widening, one multiply, one
    * power-of-two scale, floor; integer sums are order-independent),
    * then the shared [[rrFromCovariance]] tail. Because every stage
    * is exact, the result is BIT-IDENTICAL to running the distributed
    * learner on a DataFrame of the same vectors — which is what lets
    * q99 embed this R as oracle literals while the Spark side learns
    * it through the real distributed path: any divergence in the
    * distributed Gram/mean fold breaks the q99 hash. */
  def pcaRotationRRLocal(corpus: Array[Array[Float]], m: Int,
                         dim: Int = 64,
                         scaleBits: Int = 20): Array[Array[Double]] = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val n = corpus.length
    require(n > 0, "empty corpus")
    val scale = (1L << scaleBits).toDouble
    val gram = for (i <- 0 until dim; j <- i until dim) yield {
      var s = 0L
      corpus.foreach { v =>
        val xi = if (i < v.length) v(i).toDouble else 0.0
        val xj = if (j < v.length) v(j).toDouble else 0.0
        s += math.floor(xi * xj * scale + 0.5).toLong
      }
      (i, j, n.toLong, s)
    }
    val mean = Array.tabulate(dim) { i =>
      var s = 0L
      corpus.foreach { v =>
        val xi = if (i < v.length) v(i).toDouble else 0.0
        s += math.floor(xi * scale + 0.5).toLong
      }
      s
    }
    val cov = covarianceMatrix(gram, dim, mean, n.toLong, scaleBits)
    rrFromCovariance(cov, m, dim)
  }

  /** The dense mean-free covariance from [[gramFixedPoint]] rows plus
    * the fixed-point mean (for PCA) — driver-side assembly of the
    * constant-size artifact: cov = G/n − μμᵀ with G and μ both exact
    * integer sums rescaled once. */
  def covarianceMatrix(gram: Seq[(Int, Int, Long, Long)], dim: Int,
                       meanFp: Array[Long], n: Long,
                       scaleBits: Int): Array[Array[Double]] = {
    val scale = (1L << scaleBits).toDouble
    val g = Array.ofDim[Double](dim, dim)
    gram.foreach { case (i, j, _, s) =>
      val v = s.toDouble / (scale * n)
      g(i)(j) = v; g(j)(i) = v
    }
    val mu = meanFp.map(_.toDouble / (scale * n))
    for (i <- 0 until dim; j <- 0 until dim) g(i)(j) -= mu(i) * mu(j)
    g
  }
}
