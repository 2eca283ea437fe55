package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[IvfIndex.lloydCellStats]] / [[IvfIndex.refineCentroidsDf]] — the
  * distributed Lloyd refinement step. Contracts under test:
  *
  *  - the fixed-point sufficient statistics equal an exact driver-side
  *    model (same fold order, same widening, same (d, cid) tie-break
  *    as the chunk kernel; q = floor(x·2^20 + 0.5) as a long) at any
  *    chunking — integer accumulation is order-independent, so this is
  *    EXACT equality, not tolerance;
  *  - one refinement iteration produces exactly the model's means
  *    ((s/2^20)/n, two IEEE ops, bit-deterministic) for non-empty
  *    cells and RETAINS the prior centroid for empty ones;
  *  - refinement does not increase quantization SSE (the Lloyd
  *    monotonicity argument, modulo the ≤2^-21-per-element
  *    quantization perturbation — asserted with a generous epsilon);
  *  - a refined frame drops into [[IvfIndex.nearDupPairsViaJoin]]
  *    where the raw quantizer did (cid labels preserved) and still
  *    recovers every planted near-dup pair.
  */
class IvfLloydSpec extends SparkSpec {
  import spark.implicits._

  private val ScaleBits = 20
  private val Scale = (1L << ScaleBits).toDouble

  private def emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")

  /** (vec_id, v) for nonzero-norm vectors — the family's base. */
  private def collectBase(df: DataFrame): Array[(Long, Array[Float])] =
    df.select(col("vec_id"), col("embedding").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter { case (_, v) =>
        // same norm test as nonZeroBase: sqrt(fold x*x) > 0
        var acc = 0.0; var i = 0
        while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(acc) > 0.0
      }
      .sortBy(_._1)

  /** Mirror of the chunk kernel's assignment: d = c2 − 2·<x,c> with
    * left-to-right double folds, winner = min (d, cid). */
  private def assignRef(rows: Array[(Long, Array[Float])],
                        cents: Array[(Long, Array[Double])]): Map[Long, Long] = {
    val withC2 = cents.map { case (cid, c) =>
      var c2 = 0.0; var i = 0
      while (i < c.length) { c2 += c(i) * c(i); i += 1 }
      (cid, c, c2)
    }
    rows.map { case (id, v) =>
      var bestD = Double.PositiveInfinity
      var bestC = Long.MaxValue
      withC2.foreach { case (cid, c, c2) =>
        var acc = 0.0; var i = 0
        val n = math.min(v.length, c.length)
        while (i < n) { acc += v(i).toDouble * c(i); i += 1 }
        val d = c2 - 2.0 * acc
        if (d < bestD || (d == bestD && cid < bestC)) { bestD = d; bestC = cid }
      }
      id -> bestC
    }.toMap
  }

  /** (cell, pos 1-based) -> (n_members, s_fp) over the reference
    * assignment. */
  private def statsRef(rows: Array[(Long, Array[Float])],
                       cells: Map[Long, Long]): Map[(Long, Int), (Long, Long)] =
    rows.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, i) =>
        ((cells(id), i + 1),
          math.floor(x.toDouble * Scale + 0.5).toLong)
      }
    }.groupBy(_._1)
      .map { case (k, qs) => k -> (qs.length.toLong, qs.map(_._2).sum) }

  /** The lowest-k nonzero quantizer as driver arrays (cid = vec_id,
    * float values widened), mirroring sampleQuantizerDf. */
  private def quantRef(rows: Array[(Long, Array[Float])],
                       cellSize: Int): Array[(Long, Array[Double])] = {
    val k = math.max(1, math.ceil(rows.length.toDouble / cellSize).toInt)
    rows.take(k).map { case (id, v) => (id, v.map(_.toDouble)) }
  }

  test("lloydCellStats equals the exact driver model at one chunk and " +
    "at many (integer accumulation is order-independent)") {
    val rows = collectBase(emb)
    val cents = quantRef(rows, 64)
    val want = statsRef(rows, assignRef(rows, cents))
    val (cdf, k) = IvfIndex.sampleQuantizerDf(emb, 64)
    assert(k == cents.length)
    for (chunkSize <- Seq(4096, 3)) {
      val got = IvfIndex.lloydCellStats(emb, cdf, chunkSize,
          kEstimate = Some(k), scaleBits = ScaleBits)
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)),
          (r.getLong(2), r.getLong(3)))).toMap
      assert(got == want, s"chunkSize=$chunkSize: " +
        s"${(got.toSet -- want.toSet).take(3)} extra, " +
        s"${(want.toSet -- got.toSet).take(3)} missing")
    }
  }

  test("one refinement iteration = exact model means; empty cells keep " +
    "their prior centroid") {
    val rows = collectBase(emb)
    val cents = quantRef(rows, 64)
    val want = statsRef(rows, assignRef(rows, cents))
    val dim = rows.head._2.length
    val wantMeans: Map[Long, Array[Double]] =
      want.keys.map(_._1).toSet.toSeq.map { (cell: Long) =>
        cell -> Array.tabulate(dim) { i =>
          val (n, s) = want((cell, i + 1))
          (s.toDouble / Scale) / n.toDouble
        }
      }.toMap

    // far-away centroid nobody picks: must survive refinement verbatim
    val far = (999999L, Seq.fill(dim)(1000.0))
    val (cdf, k) = IvfIndex.sampleQuantizerDf(emb, 64)
    val withFar = cdf.select(col("cid"),
        transform(col("v"), x => x.cast("double")).as("v"))
      .unionByName(Seq(far).toDF("cid", "v"))

    val refined = IvfIndex.refineCentroidsDf(emb, withFar, iters = 1,
        chunkSize = 3, kEstimate = Some(k + 1), scaleBits = ScaleBits)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    assert(refined.keySet == cents.map(_._1).toSet + far._1)
    assert(refined(far._1).toSeq == far._2, "empty cell must retain")
    wantMeans.foreach { case (cell, m) =>
      assert(refined(cell).toSeq == m.toSeq, s"cell $cell mean mismatch")
    }
    // cells that exist in the quantizer but got no members also retain
    (cents.map(_._1).toSet -- wantMeans.keySet).foreach { cell =>
      assert(refined(cell).toSeq ==
        cents.find(_._1 == cell).get._2.toSeq, s"cell $cell must retain")
    }
  }

  test("refinement does not increase quantization SSE") {
    val rows = collectBase(emb)
    val cents = quantRef(rows, 64)
    def sse(cs: Array[(Long, Array[Double])]): Double =
      rows.map { case (_, v) =>
        cs.map { case (_, c) =>
          var d = 0.0; var i = 0
          while (i < v.length) {
            val t = v(i).toDouble - c(i); d += t * t; i += 1
          }
          d
        }.min
      }.sum
    val (cdf, k) = IvfIndex.sampleQuantizerDf(emb, 64)
    val refined = IvfIndex.refineCentroidsDf(emb, cdf, iters = 2,
        kEstimate = Some(k), scaleBits = ScaleBits)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val before = sse(cents)
    val after = sse(refined)
    assert(after <= before * (1.0 + 1e-9) + 1e-6,
      s"SSE rose: $before -> $after")
    assert(after < before, "refinement should strictly improve on " +
      "this corpus (sample init is far from the fixed point)")
  }

  test("refineCentroidsConverged stops at the exact integer fixed " +
    "point, before maxIters, and its result IS a fixed point") {
    // well-separated clusters so Lloyd settles fast: 4 far centers,
    // 25 tight members each, one low-id seed per cluster
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian() * 20))
    val rows = (0 until 100).map { id =>
      val c = centers(id % 4)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat).toSeq)
    }
    val d = rows.toDF("vec_id", "embedding")
    val (c0, k) = IvfIndex.sampleQuantizerDf(d, 25)
    val (refined, iters) = IvfIndex.refineCentroidsConverged(d, c0,
      maxIters = 25, chunkSize = 16, kEstimate = Some(k),
      scaleBits = ScaleBits)
    assert(iters < 25, "should converge well before maxIters")
    assert(iters >= 2, "fixed-point detection needs at least two sweeps")
    // the result is a genuine fixed point: one more refinement sweep
    // reproduces the centroids bit-for-bit (integer stats + exact
    // divisions make this equality exact, not approximate)
    val again = IvfIndex.refineCentroidsDf(d, refined, iters = 1,
      chunkSize = 16, kEstimate = Some(k), scaleBits = ScaleBits)
    val a = refined.orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val b = again.orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(a.length == b.length)
    a.zip(b).foreach { case ((cid1, v1), (cid2, v2)) =>
      assert(cid1 == cid2)
      assert(v1.sameElements(v2), s"centroid $cid1 moved after the " +
        "declared fixed point")
    }
  }

  test("a converged train releases every internal pin: the block-store " +
    "ledger grows by exactly the returned centroids") {
    // same well-separated corpus as the fixed-point test, so the loop
    // genuinely iterates (>= 2 sweeps) before converging
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(4)(Array.fill(64)(rnd.nextGaussian() * 20))
    val rows = (0 until 100).map { id =>
      val c = centers(id % 4)
      (id.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat).toSeq)
    }
    val d = rows.toDF("vec_id", "embedding")
    val (c0, k) = IvfIndex.sampleQuantizerDf(d, 25)
    c0.count() // materialize any quantizer-internal state first
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val (refined, iters) = IvfIndex.refineCentroidsConverged(d, c0,
      maxIters = 25, chunkSize = 16, kEstimate = Some(k),
      scaleBits = ScaleBits)
    assert(iters >= 2, "loop must genuinely iterate for this to test anything")
    // the returned centroids carry the ONE caller-owned pin; releasing
    // it must leave the ledger exactly where it started — pre-fix, the
    // converged exit stranded the last two stats frames plus every
    // superseded cents pin (and the in-loop unpersists were silent
    // no-ops: Dataset.unpersist does not reach checkpointed RDDs)
    graft.engine.Checkpoints.release(refined)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"converged train leaked RDD ids: $leaked")
    // the maxIters exit must be leak-free too: cap strictly below the
    // convergence point just measured, so this run exits via the cap
    val before2 = sc.getPersistentRDDs.keySet
    val (capped, iters2) = IvfIndex.refineCentroidsConverged(d, c0,
      maxIters = iters - 1, chunkSize = 16, kEstimate = Some(k),
      scaleBits = ScaleBits)
    assert(iters2 == iters - 1)
    graft.engine.Checkpoints.release(capped)
    val leaked2 = sc.getPersistentRDDs.keySet -- before2
    assert(leaked2.isEmpty, s"maxIters exit leaked RDD ids: $leaked2")
  }

  test("a converged-refined quantizer feeds the IVF-PQ index build " +
    "and serves identically to the direct placement path") {
    val cfg = Pq.PqConfig(m = 8, ksub = 16, bitsPerCode = 4, dim = 64)
    val (c0, k) = IvfIndex.sampleQuantizerDf(emb, 64)
    val (refined, _) = IvfIndex.refineCentroidsConverged(emb, c0,
      maxIters = 5, chunkSize = 16, kEstimate = Some(k),
      scaleBits = ScaleBits)
    val cb = Pq.sampleCodebooks(emb, cfg)
    // build the serving index from the REFINED quantizer (the q94
    // layout with a trained coarse stage), write/read through the
    // bucketed store, and serve
    val indexed = Pq.placeAndEncode(emb, refined, k, cb, cfg)
      .select("cell", "vec_id", "pq_code")
    val wh = tmpDir("lloyd-ivfpq-wh")
    val table = graft.engine.TableStore.writeBucketed(indexed, wh,
      "lloyd_cells", 4, Seq("cell"))
    val fromIndex = Pq.ivfPqServe(spark.table(table), emb, refined, k,
        cb, cfg, nProbe = 2, nQueries = 10, k = 5, shortlist = 30)
      .orderBy("query_id", "rank").collect()
    val direct = Pq.ivfPqServe(indexed, emb, refined, k, cb, cfg,
        nProbe = 2, nQueries = 10, k = 5, shortlist = 30)
      .orderBy("query_id", "rank").collect()
    assert(fromIndex.length == direct.length && fromIndex.length > 0)
    fromIndex.zip(direct).foreach { case (x, y) => assert(x == y) }
  }

  test("refined centroids drop into nearDupPairsViaJoin and recover " +
    "every planted pair") {
    val planted = Similarity.plantNearDups(emb, 50)
    val (cdf, k) = IvfIndex.sampleQuantizerDf(planted, 64)
    val refined = IvfIndex.refineCentroidsDf(planted, cdf, iters = 1,
      kEstimate = Some(k), scaleBits = ScaleBits)
    val pairs = IvfIndex.nearDupPairsViaJoin(planted, 0.7, refined,
        nProbe = 2, kEstimate = Some(k))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val wantPlanted = (0L until 50L).map(i => (i, maxId + 1 + i)).toSet
    assert(wantPlanted.subsetOf(pairs),
      s"missing planted pairs: ${(wantPlanted -- pairs).take(5)}")
  }
}
