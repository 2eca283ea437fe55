package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** [[IvfIndex.nearDupPairs]] — the clustered (SemDeDup-style) pair
  * path for the moderate-threshold regime: precision is exact by
  * construction (candidates are reranked), recall vs the exact kernel
  * is MEASURED here, and candidate coverage is monotone in nProbe. */
class IvfNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  // the raw q58 fixture: data-independent, survives testdata regen
  // (q74 registers the NORMALIZED 128-cell variant — see below)
  private val pinned: Array[(Int, Seq[Double])] =
    Similarity.hyperplanes(16, 64, seed = 7L).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }

  test("precision is exact and recall vs the exact kernel is high on the " +
    "real corpus in the moderate 0.45 regime (characterization)") {
    val exact = asMap(Similarity.allPairsBlocked(emb, 0.45, 4))
    val ivf = asMap(IvfIndex.nearDupPairs(emb, 0.45, pinned, nProbe = 2))
    // precision: every emitted pair is a true pair at the same
    // floor-scaled similarity — the rerank is the same exact fold
    ivf.foreach { case (pair, sim) =>
      assert(exact.get(pair).contains(sim), s"false/mis-scored pair $pair")
    }
    // recall: measured, not guaranteed — 14/14 on this corpus (the
    // organic ≥0.45 pairs are far tighter than the 16-cell Voronoi
    // boundaries). The floor leaves room for a regenerated corpus
    // without letting a boundary-recall regression hide.
    assert(exact.nonEmpty)
    val recall = ivf.size.toDouble / exact.size
    assert(recall >= 0.75, s"recall $recall (${ivf.size}/${exact.size})")
  }

  test("recall with a TRAINED sample quantizer matches the pinned fixture's " +
    "on this corpus, and nProbe=2 candidates strictly contain nProbe=1's") {
    val trained = IvfIndex.trainOnSample(emb, 16, 3)
    val exact = asMap(Similarity.allPairsBlocked(emb, 0.45, 4))
    val r2 = asMap(IvfIndex.nearDupPairs(emb, 0.45, trained, nProbe = 2))
    assert(r2.size.toDouble / exact.size >= 0.75,
      s"trained recall ${r2.size}/${exact.size}")
    // the nearest cell is the head of the nProbe-sorted list, so the
    // nProbe=1 assignment is a prefix of nProbe=2's: pair containment
    val r1 = asMap(IvfIndex.nearDupPairs(emb, 0.45, trained, nProbe = 1))
    assert(r1.keySet.subsetOf(r2.keySet),
      s"nProbe=1 found pairs nProbe=2 lost: ${r1.keySet -- r2.keySet}")
  }

  test("tight-pair regime (the q74 registration): every planted 0.995 " +
    "clone co-resides with its source under the data-adaptive sample " +
    "quantizer and is found at 0.7; the organic corpus contributes none") {
    val planted = Similarity.plantNearDups(emb, 50)
    val cents = IvfIndex.sampleCentroids(planted, 64)
    // k tracks the corpus: ceil((2000 organic + 50 clones) / 64)
    assert(cents.length == math.ceil((emb.count() + 50) / 64.0).toInt)
    val pairs = IvfIndex.nearDupPairs(planted, 0.7, cents, nProbe = 2)
      .orderBy("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val off = emb.agg(max("vec_id")).head.getLong(0) + 1
    assert(pairs.toSeq == (0L until 50L).map(i => (i, i + off)),
      s"got ${pairs.length}: ${pairs.take(5).mkString(",")}")
  }

  test("zero-norm vectors join no pair (shared convention), and an " +
    "engineered near-identical pair is found through cell co-residence") {
    val cents = Similarity.hyperplanes(4, 3, seed = 11L).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
    val df = Seq(
      (0L, Seq(1f, 0f, 0f), "a"),
      (1L, Seq(1f, 1e-7f, 0f), "b"),
      (2L, Seq(0f, 0f, 0f), "z")).toDF("vec_id", "embedding", "label")
    val got = IvfIndex.nearDupPairs(df, 0.9, cents, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L)), got.mkString(","))
  }
}
