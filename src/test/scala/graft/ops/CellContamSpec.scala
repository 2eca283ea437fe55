package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Similarity.embeddingContaminationCells]] — the SemDeDup-shaped
  * candidate generator in front of the exact contamination verify
  * (q147 stage 4). The binding contract is DROP-SET EQUALITY with
  * [[Similarity.embeddingContamination]]: candidates are scored with
  * the identical exact cosine, so the kernels can only diverge on a
  * ≥τ pair the probe set misses — pinned here on the testdata
  * slices, on a low-τ corpus where cross pairs actually exist, and
  * on a PLANTED near-identical contamination corpus (the case that
  * matters at τ = 0.9, where organic testdata has no pairs at all). */
class CellContamSpec extends SparkSpec {

  private def keepSet(df: DataFrame): Map[Long, Boolean] =
    df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  private def exactKeep(corpus: DataFrame, bench: DataFrame,
                        tau: Long): Map[Long, Boolean] =
    Similarity.embeddingContamination(corpus, bench, tau)
      .select("vec_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  private def capstoneSlices(dir: String): (DataFrame, DataFrame) = {
    val emb = Tables(spark, dir, "embeddings")
    (emb.filter(col("vec_id") % 10 =!= 3),
      emb.filter(col("vec_id") % 10 === 3))
  }

  test("drop-set equality with the exact kernel on the capstone " +
    "slices at tau=0.9 (sf0.001 and sf0.01)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val (c, b) = capstoneSlices(d)
      val cells = keepSet(
        Similarity.embeddingContaminationCells(c, b, 900000L))
      val exact = exactKeep(c, b, 900000L)
      assert(cells === exact, s"keep maps diverge at $d")
    }
  }

  test("low tau is one-sided: cells drops are a SUBSET of exact " +
    "drops (never a false drop), and misses are the documented " +
    "limitation of cluster pruning below the near-dup regime") {
    // at tau=0.4 a contaminated pair is NOT near-identical, so its
    // centroid rankings can diverge past the probe set — measured on
    // this fixture: the cells kernel catches 6 of the exact kernel's
    // 7 drops (vec 399 straddles a probe boundary). This is the
    // inherent SemDeDup trade the kernel's scaladoc names; the
    // binding claims are (a) verification is exact, so a drop can
    // never be false, and (b) at the serving regime (tau=0.9,
    // near-identical pairs) the drop sets are EQUAL — the other
    // tests in this suite.
    val (c, b) = capstoneSlices("/root/testdata/sf0.01")
    val cellsDrop = keepSet(
      Similarity.embeddingContaminationCells(c, b, 400000L))
      .collect { case (id, false) => id }.toSet
    val exactDrop = exactKeep(c, b, 400000L)
      .collect { case (id, false) => id }.toSet
    assert(exactDrop.nonEmpty,
      "fixture regression: no drops at tau=0.4 — the subset check " +
        "is vacuous, lower the threshold")
    assert(cellsDrop.subsetOf(exactDrop),
      s"FALSE drops: ${(cellsDrop -- exactDrop).take(5)} — exact " +
        "verification must make a false drop impossible")
    assert(cellsDrop.nonEmpty,
      "cells kernel caught none of the exact drops at tau=0.4")
  }

  test("planted near-identical contamination at tau=0.9 is dropped " +
    "by both kernels identically") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    // clones of bench-slice vectors (vec_id % 10 == 3 survives into
    // the planted clone ids only by accident of the offset, so split
    // by ROLE instead: organic non-bench rows + all clones = corpus,
    // organic bench slice = bench — every clone of a bench vector is
    // a true contamination the kernels must drop)
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val planted = Similarity.plantNearDups(emb, nPlanted = 40)
    val corpus = planted.filter(
      col("vec_id") > maxId || col("vec_id") % 10 =!= 3)
    val bench = planted.filter(
      col("vec_id") <= maxId && col("vec_id") % 10 === 3)
    val cells = keepSet(
      Similarity.embeddingContaminationCells(corpus, bench, 900000L))
    val exact = exactKeep(corpus, bench, 900000L)
    assert(cells === exact)
    assert(exact.values.exists(!_),
      "fixture regression: planting produced no contamination — " +
        "the parity check is vacuous")
  }

  test("plan shape: candidates meet in a broadcast-hash join on " +
    "cell and the only shuffle is the per-vec_id aggregate — the " +
    "corpus is never exchanged before the join") {
    val (c, b) = capstoneSlices("/root/testdata/sf0.01")
    val plan = Similarity.embeddingContaminationCells(c, b, 900000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bench cells must broadcast:\n" + plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      "corpus-side shuffle join crept in:\n" + plan)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly 1 shuffle exchange (the per-vec_id " +
        s"aggregate), got $exchanges:\n$plan")
  }

  test("contaminationKeep dispatches on tau — cells at 0.9 (the " +
    "near-dup regime), exact below the crossover, and the " +
    "graft.decontam.exact conf forces exact at any tau") {
    // the decision law itself
    assert(Similarity.contaminationUseCells(spark, 900000L))
    assert(!Similarity.contaminationUseCells(spark, 400000L))
    val prev = spark.conf.getOption(Similarity.DecontamExactKey)
    try {
      spark.conf.set(Similarity.DecontamExactKey, "true")
      assert(!Similarity.contaminationUseCells(spark, 900000L))
    } finally prev match {
      case Some(v) => spark.conf.set(Similarity.DecontamExactKey, v)
      case None => spark.conf.unset(Similarity.DecontamExactKey)
    }
    // and the plan each branch actually builds: the cell path meets
    // candidates in a broadcast-HASH join on cell; the exact path is
    // the broadcast nested-loop cross join — distinguishable from the
    // executed plan, so the dispatch is pinned on the real output,
    // not just the predicate
    val (c, b) = capstoneSlices("/root/testdata/sf0.001")
    val atHigh = Similarity.contaminationKeep(c, b, 900000L)
      .queryExecution.executedPlan.toString
    assert(atHigh.contains("BroadcastHashJoin") &&
      !atHigh.contains("BroadcastNestedLoopJoin"),
      s"tau=0.9 must take the cell path:\n$atHigh")
    val atLow = Similarity.contaminationKeep(c, b, 400000L)
      .queryExecution.executedPlan.toString
    assert(atLow.contains("BroadcastNestedLoopJoin"),
      s"tau=0.4 must take the exact cross-join path:\n$atLow")
    // below the crossover the dispatched keep map IS the exact law —
    // the one-sided cells miss (vec 399's class of boundary
    // straddles) can no longer reach a contaminationKeep caller
    assert(keepSet(Similarity.contaminationKeep(c, b, 400000L))
      === exactKeep(c, b, 400000L))
  }

  test("graft.decontam.nProbe widens the cell path's probe set " +
    "(nProbe = k collapses cluster pruning to the exact drop set)") {
    // conf plumbing: the resolved value contaminationKeep hands the
    // cell path follows the session conf, default 4
    val prev = spark.conf.getOption(Similarity.DecontamNProbeKey)
    try {
      assert(Similarity.decontamNProbe(spark) === 4)
      spark.conf.set(Similarity.DecontamNProbeKey, "16")
      assert(Similarity.decontamNProbe(spark) === 16)
    } finally prev match {
      case Some(v) => spark.conf.set(Similarity.DecontamNProbeKey, v)
      case None => spark.conf.unset(Similarity.DecontamNProbeKey)
    }
    // and the lever's effect: at tau=0.4 the default nProbe=4 misses
    // one exact drop (the documented one-sided limitation); probing
    // EVERY cell makes the candidate set exhaustive, so the drop
    // sets must equalize — the remediation widening measured doing
    // its job. 1024 >> k (~29 cells here): nearestCells caps at the
    // cell count.
    val (c, b) = capstoneSlices("/root/testdata/sf0.01")
    val widened = keepSet(
      Similarity.embeddingContaminationCells(c, b, 400000L,
        nProbe = 1024))
    assert(widened === exactKeep(c, b, 400000L))
  }

  test("empty bench keeps every nonzero-norm corpus vector; " +
    "zero-norm rows follow the shared convention (absent)") {
    val sp = spark
    import sp.implicits._
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f), "a"),
      (1L, Seq(0.0f, 0.0f), "a")) // zero norm -> no row
      .toDF("vec_id", "embedding", "label")
    val bench = corpus.limit(0)
    val got = keepSet(
      Similarity.embeddingContaminationCells(corpus, bench, 900000L))
    assert(got === Map(0L -> true))
  }
}
