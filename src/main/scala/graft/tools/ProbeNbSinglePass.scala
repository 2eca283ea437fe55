package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Checkpoints, Tables}
import graft.ops.Hashing.{h60, idiv, tokens}
import graft.ops.{TextAnalysis, VocabJoin}
import graft.queries.Capstone

/** Same-JVM A/B of the capstone's stages 5–6 (NB gate + CE select):
  * the GATED per-occurrence kernels vs a one-tokenize-pass
  * alternative where both stages consume a pinned per-document token
  * MULTIPLICITY frame (doc_id, lang, source, t, cnt) and every
  * Σ_tokens f(t) becomes Σ_distinct cnt·f(t) — the q115 single-pass
  * discipline applied ACROSS stages (round-16 verdict item 3 asked
  * whether stage 5's re-tokenize of the corpus stage 6 tokenizes
  * again can be shared).
  *
  * MEASURED ANSWER (x100, 500k docs, interleaved A/B × 3 with the
  * block cache cleared per rep, kept doc_id sets asserted identical,
  * 69,634 rows): INDISTINGUISHABLE — classic 18.9–19.4 s, counts
  * 18.6–20.3 s, window-argmin 18.5–19.3 s, spreads inside the epoch
  * noise. What the shared pass saves (two whole-stage-codegen
  * tokenize scans over the already-pinned stage-4 text) it pays back
  * in the corpus-sized (doc_id, …, t) groupBy exchange (map-side
  * partial aggregation only collapses within-partition duplicates,
  * and per-doc tokens are mostly near-distinct here) plus the pin's
  * write+read of a frame comparable to the token stream. Stages 5–6
  * are EXCHANGE-floor-bound (the per-class stats aggregate and the
  * (doc, class) scoring aggregate), not tokenize-bound; the gated
  * composition keeps the classic kernels — simpler, no extra
  * corpus-sized pin to hold — and the counts variants live HERE as
  * the measured alternative backing PLANS' round-17 analysis.
  *
  * Measurement-bias postmortem (PLANS has the full account): this
  * probe's FIRST version did not clear the block cache between
  * reps, so later classic reps were served from the previous rep's
  * Checkpoints.materialize entry (plan-keyed over the SHARED pinned
  * dec) while the counts form — pinning a FRESH frame each rep —
  * always paid full cost: it read "counts ~2× slower" (8.8 vs
  * 17.7 s) where the honest number is a wash. clearCache per rep is
  * load-bearing in every same-plan A/B harness.
  *
  * The bench host is non-stationary (six contended epochs), so the
  * comparison interleaves variants inside ONE session over ONE
  * pinned stage-4 frame — the ProbeLmDispatch discipline.
  *
  * Round 17 second half added the `pivot` mode — the CLASS-PIVOTED
  * production kernel (TextAnalysis.nbScore's ≤budget branch; per-class
  * bits as |C| columns of one vocab-sized frame, no ×|C| crossJoin) —
  * against `classic` = the SAME production entry with the pivot budget
  * conf forced to 0 (the docs×classes fallback branch), so both twins
  * are production code paths. MEASURED (x100, interleaved ×3, kept
  * sets identical, 69,634): classic min 19.52 s vs pivot min 12.18 s
  * (the canonical run, quoted by OPTIMIZATION_r17/PLANS/COVERAGE; an
  * earlier same-day run read 17.62/12.71 — r17 ADVICE item 4 aligned
  * every doc on the canonical pair)
  * on stages 5–6 — the ×|C| scoring blowup was real cost, and the
  * pivot SHIPPED as the default.
  *
  * Usage: ProbeNbSinglePass [dir] [reps] [modes]
  *   (default /tmp/scale_x100 2 classic,counts;
  *    modes: classic|counts|window|pivot). */
object ProbeNbSinglePass {

  /** Per-document token multiplicities — the shared-pass frame.
    * `carryCols` rides doc-constant metadata through the group key
    * (functionally dependent on doc_id: no cardinality change). */
  def docTokenCounts(docs: DataFrame,
                     carryCols: Seq[String] = Seq("lang")): DataFrame = {
    val keys = col("doc_id") +: carryCols.map(col)
    docs.select(keys :+ explode(tokens(col("text"))).as("t"): _*)
      .groupBy(keys :+ col("t"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[TextAnalysis.nbScore]] over precomputed [[docTokenCounts]]
    * frames: trainDocs feeds ONLY the class priors (zero-token train
    * docs have no count row but must count), trainTok the per-class
    * token stats, testTok the scored rows. Row-identical to the
    * classic kernel — every Σ_tokens bits term replayed as
    * Σ_distinct cnt·bits, exact integer multiply; NbCountsParitySpec
    * pins the equality on hand-worked edges and real tables. */
  def nbScoreCounts(trainDocs: DataFrame, trainTok: DataFrame,
                    testTok0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same NULL-lang convention as the classic kernel (see there)
    val cnt = trainTok.filter(col("lang").isNotNull)
      .select(col("lang").as("c_lang"), col("t"), col("cnt"))
      .groupBy("c_lang", "t").agg(sum(col("cnt")).as("c"))
      .cache()
    val tc = cnt.groupBy("c_lang").agg(sum(col("c")).as("t_c"))
    val v = cnt.select("t").distinct().agg(count(lit(1)).as("v"))
    val train = trainDocs.filter(col("lang").isNotNull)
    val cls = train.groupBy(col("lang").as("c_lang"))
      .agg(count(lit(1)).as("n_c"))
    val nTot = train.agg(count(lit(1)).as("n"))
    val cdef = cls.join(tc, Seq("c_lang"), "left")
      .crossJoin(broadcast(v)).crossJoin(broadcast(nTot))
      .select(col("c_lang"),
        (length(bin(coalesce(col("t_c"), lit(0L)) + col("v"))) - 1)
          .cast("long").as("bdef"),
        (length(bin(idiv(col("n"), col("n_c")))) - 1)
          .cast("long").as("bprior"))
    val bits = cnt.join(tc, Seq("c_lang")).crossJoin(broadcast(v))
      .select(col("c_lang"), col("t"),
        (length(bin(idiv(col("t_c") + col("v"), col("c") + lit(1L)))) - 1)
          .cast("long").as("b"))
    val testTok = testTok0
      .select(col("doc_id"), col("lang"), col("t"), col("cnt"))
    val scored = VocabJoin.join(
        testTok.crossJoin(broadcast(cdef)), bits, Seq("c_lang", "t"), "left")
      .groupBy(col("doc_id"), col("lang"), col("c_lang"), col("bprior"))
      .agg(sum(coalesce(col("b"), col("bdef")) * col("cnt")).as("sb"))
      .select(col("doc_id"), col("lang"), col("c_lang"),
        (col("bprior") + col("sb")).as("bits_total"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("bits_total").asc, col("c_lang").asc)
    val out = scored.withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("doc_id"), col("lang"), col("c_lang").as("pred_lang"),
        col("bits_total"), (col("lang") === col("c_lang")).as("correct"))
      .transform(graft.engine.Checkpoints.materialize)
    cnt.unpersist(blocking = false)
    out
  }

  /** [[TextAnalysis.nbLangClassifier]]'s mod-slice split over a
    * [[docTokenCounts]] frame, delegating to [[nbScoreCounts]]. */
  def nbLangClassifierCounts(docs: DataFrame, tokCounts: DataFrame,
                             trainMod: Int = 10,
                             trainRem: Int = 7): DataFrame = {
    val isTrain = pmod(col("doc_id"), lit(trainMod.toLong)) === trainRem
    nbScoreCounts(docs.filter(isTrain), tokCounts.filter(isTrain),
      tokCounts.filter(!isTrain))
  }

  /** [[TextAnalysis.crossEntropySelect]] over a [[docTokenCounts]]
    * frame — same integer-bits law, every token-stream aggregate
    * weighted by cnt; row-identical to the classic kernel
    * (NbCountsParitySpec). */
  def crossEntropySelectCounts(tokCounts: DataFrame, targetPred: Column,
                               buckets: Int = 1024,
                               thetaX1000: Long = 0L): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val tok = tokCounts
      .select(col("doc_id"), targetPred.as("is_t"),
        pmod(h60(col("t")), lit(buckets.toLong)).as("b"), col("cnt"))
    val cnt = tok.groupBy("b").agg(
      sum(col("cnt")).as("c_r"),
      sum(when(col("is_t"), col("cnt")).otherwise(0L)).as("c_t"))
    val tot = cnt.agg(sum(col("c_r")).as("t_r"), sum(col("c_t")).as("t_t"))
    val lm = cnt.crossJoin(broadcast(tot))
      .select(col("b"),
        (length(bin(idiv(col("t_t") + lit(buckets.toLong),
          col("c_t") + lit(1L)))) - 1).cast("long").as("bits_t"),
        (length(bin(idiv(col("t_r") + lit(buckets.toLong),
          col("c_r") + lit(1L)))) - 1).cast("long").as("bits_r"))
    tok.join(broadcast(lm), Seq("b"))
      .groupBy(col("doc_id"), col("is_t"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum((col("bits_t") - col("bits_r")) * col("cnt")).as("dsum"))
      .select(col("doc_id"), col("is_t").as("is_target"), col("n_tokens"),
        idiv(lit(1000L) * col("dsum"),
          greatest(col("n_tokens"), lit(1L))).as("ce_diff_x1000"))
      .withColumn("keep", col("ce_diff_x1000") <= thetaX1000)
  }

  /** [[TextAnalysis.nbScore]] with the argmin computed by the
    * ROW_NUMBER WINDOW the kernel used through round 16 (exchange +
    * sort over the docs×classes scored frame, first row per doc)
    * instead of the production min-over-struct aggregate. Same rows
    * by construction (struct ordering is lexicographic = the
    * window's (bits_total asc, c_lang asc)), and built over the SAME
    * [[TextAnalysis.nbScoredFrame]] model build as production, so
    * the A/B can never drift from the kernel's law — only the argmin
    * tail differs. */
  def nbScoreWindow(trainDocs: DataFrame, testDocs: DataFrame): DataFrame = {
    val (scored, cnt) = TextAnalysis.nbScoredFrame(trainDocs, testDocs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("bits_total").asc, col("c_lang").asc)
    val out = scored.withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("doc_id"), col("lang"), col("c_lang").as("pred_lang"),
        col("bits_total"), (col("lang") === col("c_lang")).as("correct"))
      .transform(graft.engine.Checkpoints.materialize)
    cnt.unpersist(blocking = false)
    out
  }

  /** Stage 5 over [[nbScoreWindow]], mod-slice law. */
  private def nbGateWindow(dec: DataFrame): DataFrame = {
    val seven = pmod(col("doc_id"), lit(10L)) === 7
    val nbKeep = nbScoreWindow(dec.filter(seven), dec.filter(!seven))
      .filter(col("correct")).select("doc_id")
    Checkpoints.pin(dec.filter(seven)
      .unionByName(dec.join(nbKeep, Seq("doc_id"), "left_semi")))
  }

  /** Stages 5–6 in the counts form: one pinned token-count frame,
    * both gates consuming it (CE over the sel1-survivor slice). */
  private def countsStages(dec: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val tok = Checkpoints.pin(docTokenCounts(dec, Seq("lang", "source")))
    val nbKeep = nbLangClassifierCounts(dec, tok)
      .filter(col("correct")).select("doc_id")
    val sel1 = Checkpoints.pin(
      dec.filter(pmod(col("doc_id"), lit(10L)) === 7)
        .unionByName(dec.join(nbKeep, Seq("doc_id"), "left_semi")))
    val tokSel = tok.join(sel1.select("doc_id"), Seq("doc_id"), "left_semi")
    val ceScores = Checkpoints.pin(
      crossEntropySelectCounts(tokSel,
          col("source") === "src0", buckets = 256, thetaX1000 = 0L)
        .select(col("doc_id"), col("ce_diff_x1000")))
    val mRow = ceScores
      .agg(sum(col("ce_diff_x1000")), count(lit(1))).head()
    val thr = if (mRow.isNullAt(0) || mRow.getLong(1) == 0L) 0L
              else mRow.getLong(0) / mRow.getLong(1)
    val sel2 = Checkpoints.pin(sel1.join(
      ceScores.filter(col("ce_diff_x1000") <= thr).select("doc_id"),
      Seq("doc_id"), "left_semi"))
    Checkpoints.release(ceScores)
    (tok, sel1, sel2)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale_x100")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.floored(spark, dir, "documents", "doc_id")
      .select("doc_id", "text", "lang", "source")
    val emb = Tables(spark, dir, "embeddings")
    val clean = Capstone.cleanDocs(docs)
    val dec = Capstone.decontam(clean, emb)
    clean.unpersist(blocking = false)
    println(s"dir=$dir dec=${dec.count()}")

    // run one variant end-to-end (stages 5+6), return kept ids + wall.
    // clearCache BEFORE each rep: the kernels' internal
    // Checkpoints.materialize entries are keyed by logical plan over
    // the SHARED pinned dec, so without it a later rep of the same
    // variant is served from the previous rep's cache and measures
    // almost nothing (the Probe `time` lesson; pins survive
    // clearCache — they are RDD-level, not CacheManager entries)
    def run(tag: String, mode: String): (Seq[Long], Double) = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val frames: Seq[DataFrame] = mode match {
        case "counts" =>
          val (t, s1, s2) = countsStages(dec); Seq(t, s1, s2)
        case "window" =>
          val s1 = nbGateWindow(dec)
          Seq(s1, Capstone.ceSelect(s1))
        case "pivot" =>
          // the round-17 production default (class-pivoted nbScore)
          val s1 = Capstone.nbGate(dec)
          Seq(s1, Capstone.ceSelect(s1))
        case "classic" =>
          // the pre-r17 docs×classes kernel, forced via the pivot
          // budget conf so the twin is the production fallback branch
          // itself, never a transcription
          spark.conf.set(TextAnalysis.NbPivotMaxClassesKey, "0")
          try {
            val s1 = Capstone.nbGate(dec)
            Seq(s1, Capstone.ceSelect(s1))
          } finally spark.conf.unset(TextAnalysis.NbPivotMaxClassesKey)
        case m => sys.error(s"unknown mode '$m' (classic|counts|window|pivot)")
      }
      val ids = frames.last.select("doc_id").collect().map(_.getLong(0))
        .sorted.toSeq
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[nb-ab] $tag%-8s ${wall}%6.2f s  sel2=${ids.size}")
      frames.foreach(Checkpoints.release)
      (ids, wall)
    }

    // modes via arg 3, default the classic-vs-counts pair
    val modes = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("classic", "counts"))
    val runs = (1 to reps).flatMap { i =>
      modes.map(m => (m, run(s"$m$i", m)))
    }
    require(runs.map(_._2._1).distinct.size == 1,
      "variants diverge on kept doc_ids")
    val mins = modes.map(m =>
      f"$m min ${runs.filter(_._1 == m).map(_._2._2).min}%.2f s")
    println(s"[nb-ab] ${mins.mkString(", ")}, " +
      s"rows identical (${runs.head._2._1.size})")
    Checkpoints.release(dec)
    spark.stop()
  }
}
