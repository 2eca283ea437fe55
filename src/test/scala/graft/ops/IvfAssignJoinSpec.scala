package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[IvfIndex.assignViaJoin]] — the broadcast-join assignment path for
  * quantizers past driver scale. The contract under test: on the SAME
  * centroid set, the join path's assignment (and any pair result built
  * on it) equals the literal-kernel path's row-for-row — the d values
  * share the fold order and widening, the (d, cid) tie-break is the
  * same, and the per-chunk top-nProbe merge is lossless at any
  * chunking. Centroid CHOICE (sampleCentroids vs the hash-gated
  * sampleCentroidsDf) is a quality knob, not semantics, so the
  * dispatcher test asserts plant recall, not set equality across
  * different quantizers. */
class IvfAssignJoinSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")

  private def asDf(cents: Array[(Int, Seq[Double])]): DataFrame =
    cents.toSeq.map { case (cid, c) => (cid.toLong, c) }.toDF("cid", "v")

  private def asPairs(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("assignViaJoin equals the literal fused kernel on the same " +
    "centroid set, at one chunk and at many (lossless merge)") {
    val planted = Similarity.plantNearDups(emb, 50)
    val cents = IvfIndex.sampleCentroids(planted, 64)
    val base = planted.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dotProduct(col("v"), col("v"))))
      .filter(col("nrm") > 0d).select("vec_id", "v")
    val literal = base
      .withColumn("cell", explode(
        graft.functions.VectorFunctions.nearestCells(col("v"), cents, 2)))
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // chunkSize larger than k (single chunk) and absurdly small (many
    // chunks, so the global top-nProbe must be assembled by the merge)
    for (chunkSize <- Seq(100000, 7)) {
      val joined = IvfIndex.assignViaJoin(base, asDf(cents), 2, chunkSize)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(joined == literal,
        s"chunkSize=$chunkSize: ${(joined -- literal).take(3)} extra, " +
          s"${(literal -- joined).take(3)} missing")
    }
  }

  test("assignViaJoin keepCols: payload rides the merge unchanged at " +
    "single- and multi-chunk, assignment itself unaffected; reserved " +
    "names rejected") {
    val cents = IvfIndex.sampleCentroids(emb, 64)
    val base = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("payload", col("vec_id") * 1000L + 7L)
    for (chunkSize <- Seq(100000, 7)) {
      val got = IvfIndex.assignViaJoin(base, asDf(cents), 2, chunkSize,
          keepCols = Seq("payload"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.nonEmpty)
      got.foreach { case (vid, _, p) =>
        assert(p == vid * 1000L + 7L, s"payload mangled for vec $vid")
      }
      val withKeep = got.map(t => (t._1, t._2)).toSet
      val without = IvfIndex.assignViaJoin(
          base.select("vec_id", "v"), asDf(cents), 2, chunkSize)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(withKeep == without, "keepCols changed the assignment")
    }
    intercept[IllegalArgumentException](
      IvfIndex.assignViaJoin(base, asDf(cents), 2,
        keepCols = Seq("cell")))
  }

  test("nearDupPairsViaJoin equals nearDupPairs pair-for-pair (ids AND " +
    "sim_x1e6) on the same centroid set") {
    val planted = Similarity.plantNearDups(emb, 50)
    val cents = IvfIndex.sampleCentroids(planted, 64)
    val lit = asPairs(IvfIndex.nearDupPairs(planted, 0.7, cents, nProbe = 2))
    val join = asPairs(
      IvfIndex.nearDupPairsViaJoin(planted, 0.7, asDf(cents), nProbe = 2))
    assert(lit.nonEmpty)
    assert(join == lit,
      s"join-path pairs differ: ${(join.keySet -- lit.keySet).take(3)} extra, " +
        s"${(lit.keySet -- join.keySet).take(3)} missing")
  }

  test("the dispatcher takes the join path when k exceeds kDriverMax " +
    "and still recovers every planted 0.995 clone at 0.7") {
    val planted = Similarity.plantNearDups(emb, 50)
    // kDriverMax=1 forces the join branch with the hash-gated quantizer
    val pairs = IvfIndex.nearDupPairsClustered(planted, 0.7, Some(64),
        nProbe = 2, kDriverMax = 1)
      .orderBy("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val off = emb.agg(max("vec_id")).head.getLong(0) + 1
    assert(pairs.toSeq == (0L until 50L).map(i => (i, i + off)),
      s"got ${pairs.length}: ${pairs.take(5).mkString(",")}")
  }

  test("kEstimate: assignment is unchanged, and the quantizer is " +
    "scanned exactly once (the count() pass is gone)") {
    val planted = Similarity.plantNearDups(emb, 50)
    val cents = IvfIndex.sampleCentroids(planted, 64)
    val base = planted.select(col("vec_id"), col("embedding").as("v"))
    val k = cents.length.toLong
    // an accumulator-bumping nondeterministic UDF on the centroid rows
    // counts how many times the quantizer side is actually evaluated —
    // nondeterministic so neither count()'s column pruning nor any
    // plan rewrite can elide it
    val acc = spark.sparkContext.longAccumulator("centroidRows")
    val touch = udf((v: Seq[Double]) => { acc.add(1); v })
      .asNondeterministic()
    val counted = asDf(cents).withColumn("v", touch(col("v")))

    acc.reset()
    val withEst = IvfIndex.assignViaJoin(base, counted, 2, 7,
        kEstimate = Some(k))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(acc.value == k,
      s"quantizer evaluated ${acc.value} rows for k=$k — not one scan")

    acc.reset()
    val without = IvfIndex.assignViaJoin(base, counted, 2, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(acc.value == 2 * k,
      s"count() path should pay the second pass: ${acc.value} vs ${2 * k}")
    assert(withEst == without, "kEstimate changed the assignment")

    // a loose over-estimate only unbalances chunks, never drops rows
    val over = IvfIndex.assignViaJoin(base, asDf(cents), 2, 7,
        kEstimate = Some(k * 10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(over == without, "over-estimated k changed the assignment")
  }

  test("the dispatcher with NO explicit cell size derives it from the " +
    "law and still recovers every planted clone") {
    val planted = Similarity.plantNearDups(emb, 50)
    val pairs = IvfIndex.nearDupPairsClustered(planted, 0.7, nProbe = 2)
      .orderBy("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val off = emb.agg(max("vec_id")).head.getLong(0) + 1
    assert(pairs.toSeq == (0L until 50L).map(i => (i, i + off)),
      s"got ${pairs.length}: ${pairs.take(5).mkString(",")}")
  }

  test("hash-gated sampleCentroidsDf: k tracks the corpus without any " +
    "collect, zero-norm vectors are never centroids, cid = vec_id") {
    val df = Seq(
      (0L, Seq(1f, 0f, 0f), "a"),
      (1L, Seq(0f, 0f, 0f), "z"),
      (2L, Seq(0f, 1f, 0f), "b")).toDF("vec_id", "embedding", "label")
    // targetCellSize=1: the gate passes every nonzero-norm vector
    val cents = IvfIndex.sampleCentroidsDf(df, 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(cents.map(_._1).toSet == Set(0L, 2L))
    // and the real corpus samples ~n/cellSize
    val k = IvfIndex.sampleCentroidsDf(emb, 64).count()
    val n = emb.count()
    assert(k > 0 && k < n / 16, s"k=$k of n=$n")
  }
}
