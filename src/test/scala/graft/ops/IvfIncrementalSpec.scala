package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[IvfIndex.buildCellIndex]] + [[IvfIndex.incrementalNearDupPairs]] —
  * incremental re-dedup of a delta batch against a persisted
  * bucketed-by-cell history index. The correctness claim that makes
  * the touched-cell pruning safe: on the SAME pinned centroids, the
  * incremental output equals the full-corpus re-dedup's output
  * restricted to pairs with at least one delta side — exactly, ids
  * and sims. */
class IvfIncrementalSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")

  private def asPairs(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("incremental = full re-dedup restricted to delta-involving " +
    "pairs, on the same pinned centroids") {
    val planted = Similarity.plantNearDups(emb, 50)
    val hist = planted.filter(col("vec_id") % 3 =!= 2)
    val delta = planted.filter(col("vec_id") % 3 === 2)
    val (cents, k) = IvfIndex.sampleQuantizerDf(hist, 64)

    val wh = tmpDir("ivf-incr-wh")
    val idx = IvfIndex.buildCellIndex(hist, cents, wh, "cells_t", 4,
      nProbe = 2, chunkSize = 16, kEstimate = Some(k))
    val incr = asPairs(IvfIndex.incrementalNearDupPairs(
      spark.table(idx), delta, 0.7, cents,
      nProbe = 2, chunkSize = 16, kEstimate = Some(k)))

    // the reference: full corpus, same quantizer, then keep only pairs
    // touching the delta
    val deltaIds = delta.select("vec_id").collect().map(_.getLong(0)).toSet
    val full = asPairs(IvfIndex.nearDupPairsViaJoin(
      planted, 0.7, cents, nProbe = 2, chunkSize = 16, kEstimate = Some(k)))
    val expected = full.filter { case ((a, b), _) =>
      deltaIds(a) || deltaIds(b) }

    assert(incr.nonEmpty, "no delta-involving pairs — split degenerate")
    assert(incr == expected,
      s"${(incr.keySet -- expected.keySet).take(3)} extra, " +
        s"${(expected.keySet -- incr.keySet).take(3)} missing")
    // and it found strictly fewer pairs than the full run (the
    // history-history pairs it must NOT recompute exist in this data)
    assert(expected.size < full.size,
      "split left no history-history pairs; property vacuous")
  }

  test("delta-vs-history and delta-vs-delta pairs both surface: a " +
    "synthetic corpus with one clone in each regime") {
    import spark.implicits._
    // 8 base vectors far apart; delta contains a clone of base id 1
    // (delta-history pair) and two mutual clones (delta-delta pair)
    def unit(i: Int): Seq[Float] =
      Seq.tabulate(4)(j => if (j == i % 4) 1f else 0.01f * (i / 4))
    val hist = (0L until 8L).map(i => (i, unit(i.toInt), 0))
      .toDF("vec_id", "embedding", "label")
    val delta = Seq(
      (100L, unit(1), 0),  // ~clone of hist 1
      (101L, unit(2).map(x => (x * 1.001f)), 0), // ~clone of hist 2 AND 102
      (102L, unit(2).map(x => (x * 1.002f)), 0))
      .toDF("vec_id", "embedding", "label")
    val all = hist.unionByName(delta)
    val (cents, k) = IvfIndex.sampleQuantizerDf(hist, 2)
    val wh = tmpDir("ivf-incr-wh2")
    val idx = IvfIndex.buildCellIndex(hist, cents, wh, "cells_s", 2,
      nProbe = 2, kEstimate = Some(k))
    val pairs = IvfIndex.incrementalNearDupPairs(
        spark.table(idx), delta, 0.95, cents, nProbe = 2,
        kEstimate = Some(k))
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 100L)), s"delta-vs-history missing: $pairs")
    assert(pairs.contains((101L, 102L)), s"delta-vs-delta missing: $pairs")
    assert(pairs.contains((2L, 101L)) && pairs.contains((2L, 102L)))
    // and NO history-history pair, even though 0..7 co-reside in cells
    assert(pairs.forall { case (a, b) => a >= 100L || b >= 100L },
      s"history-history pair leaked: $pairs")
    // sanity: the full run over the union DOES contain history ids
    // only on the left of delta pairs (ids disjoint by construction)
    assert(all.count() == 11)
  }

  test("absorbIntoCellIndex: the batch is appended (history files " +
    "untouched) and the NEXT batch pairs against it — the " +
    "train-once/add-many lifecycle") {
    val planted = Similarity.plantNearDups(emb, 50)
    val h0 = planted.filter(col("vec_id") % 3 === 0)
    val b1 = planted.filter(col("vec_id") % 3 === 1)
    val b2 = planted.filter(col("vec_id") % 3 === 2)
    // centroids pinned from the ORIGINAL history only — batches must
    // never move the quantizer (the index's standing contract)
    val (cents, k) = IvfIndex.sampleQuantizerDf(h0, 64)
    val wh = tmpDir("ivf-absorb-wh")
    val idx = IvfIndex.buildCellIndex(h0, cents, wh, "cells_a", 4,
      nProbe = 2, kEstimate = Some(k))

    def dataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(wh))
        .map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val before = dataFiles()
    val rowsBefore = spark.table(idx).count()
    IvfIndex.absorbIntoCellIndex(idx, b1, cents, nProbe = 2,
      kEstimate = Some(k))
    val after = dataFiles()
    assert(spark.table(idx).count() > rowsBefore, "absorb added no rows")
    // append, not rewrite: every pre-absorb file survives verbatim
    assert(before.subsetOf(after),
      s"absorb rewrote history files: ${(before -- after).take(3)}")
    assert(after.size > before.size, "absorb wrote no new files")

    // batch2 against (h0 ∪ absorbed b1) = the full run on everything,
    // restricted to batch2-involving pairs — including the b1-vs-b2
    // CROSS-BATCH pairs that skipping absorption would silently lose
    val incr = asPairs(IvfIndex.incrementalNearDupPairs(
      spark.table(idx), b2, 0.7, cents, nProbe = 2, kEstimate = Some(k)))
    val b2Ids = b2.select("vec_id").collect().map(_.getLong(0)).toSet
    val full = asPairs(IvfIndex.nearDupPairsViaJoin(
      planted, 0.7, cents, nProbe = 2, kEstimate = Some(k)))
    val expected = full.filter { case ((a, b), _) => b2Ids(a) || b2Ids(b) }
    assert(incr == expected,
      s"${(incr.keySet -- expected.keySet).take(3)} extra, " +
        s"${(expected.keySet -- incr.keySet).take(3)} missing")
    // the cross-batch regime: plant pairs are (i, i + off), so a
    // b1-vs-b2 pair exists iff the clone offset shifts the mod-3
    // class (off % 3 != 0 puts some source in class 1 with its clone
    // in class 2). The driver regenerates testdata between rounds and
    // off = max(vec_id)+1 moves with it, so this assert must be
    // offset-aware — the class-independent guarantee lives in the
    // synthetic lifecycle test below.
    val off = emb.agg(max("vec_id")).head.getLong(0) + 1
    if (off % 3 != 0) {
      val b1Ids = b1.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(expected.keys.exists { case (a, b) => b1Ids(a) || b1Ids(b) },
        s"off=$off shifts classes yet no b1-vs-b2 pair surfaced")
    }
  }

  test("synthetic two-batch lifecycle: the cross-batch duplicate " +
    "(batch1-vs-batch2) is caught ONLY because batch1 was absorbed") {
    import spark.implicits._
    def unit(i: Int): Seq[Float] =
      Seq.tabulate(4)(j => if (j == i % 4) 1f else 0.01f * (i / 4))
    val hist = (0L until 8L).map(i => (i, unit(i.toInt), 0))
      .toDF("vec_id", "embedding", "label")
    // batch1 carries a vector; batch2 carries its near-clone — a pair
    // that exists in NO single batch and not in original history
    val b1 = Seq((100L, unit(1).map(x => x * 1.001f), 0))
      .toDF("vec_id", "embedding", "label")
    val b2 = Seq((200L, unit(1).map(x => x * 1.002f), 0))
      .toDF("vec_id", "embedding", "label")
    val (cents, k) = IvfIndex.sampleQuantizerDf(hist, 2)
    val wh = tmpDir("ivf-absorb-wh-syn")
    val idx = IvfIndex.buildCellIndex(hist, cents, wh, "cells_l", 2,
      nProbe = 2, kEstimate = Some(k))
    IvfIndex.absorbIntoCellIndex(idx, b1, cents, nProbe = 2,
      kEstimate = Some(k))
    val pairs = IvfIndex.incrementalNearDupPairs(
        spark.table(idx), b2, 0.95, cents, nProbe = 2,
        kEstimate = Some(k))
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 200L)),
      s"cross-batch duplicate missed after absorption: $pairs")
    assert(pairs.contains((1L, 200L)), s"history-vs-batch2 missed: $pairs")
  }

  test("the index is bucketed by cell and the incremental plan prunes " +
    "it to touched cells via a broadcast semi-join") {
    val planted = Similarity.plantNearDups(emb, 50)
    val hist = planted.filter(col("vec_id") % 3 =!= 2)
    // a genuinely small delta (few vectors) against many cells
    // (cellSize 8 -> ~n/8 cells), so pruning has something to prune
    val delta = planted.filter(col("vec_id") % 3 === 2)
      .filter(col("vec_id") < 20)
    val (cents, k) = IvfIndex.sampleQuantizerDf(hist, 8)
    val wh = tmpDir("ivf-incr-wh3")
    val idx = IvfIndex.buildCellIndex(hist, cents, wh, "cells_p", 4,
      nProbe = 2, chunkSize = 16, kEstimate = Some(k))
    // bucketed layout recorded in the catalog
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED `$idx`")
      .collect().map(_.mkString(" ")).mkString("\n")
    assert(desc.contains("cell"), desc)
    assert(desc.toLowerCase.contains("bucket"), desc)
    // pruning: far fewer index rows survive the touched-cell semi-join
    // than the index holds (the work the delta batch never does)
    val out = IvfIndex.incrementalNearDupPairs(spark.table(idx), delta,
      0.7, cents, nProbe = 2, chunkSize = 16, kEstimate = Some(k))
    out.count() // execute
    val total = spark.table(idx).count()
    val touched = IvfIndex.assignViaJoin(
        delta.select(col("vec_id"), col("embedding").as("v")), cents,
        2, 16, Some(k))
      .select("cell").distinct().count()
    val kCells = cents.count()
    assert(touched < kCells / 2,
      s"delta touches $touched of $kCells cells — pruning vacuous")
    assert(total > 0)
  }
}
