package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, TextAnalysis}

/** Scale-ladder wall clock for the round-13 LM-quality/mixture
  * quartet — normalized dedup, the per-lang surprisal gate, Stupid
  * Backoff, token-budget mixture — at a given data dir (sf0.1 or a
  * ScaleGen x30/x100 expansion). Warm + min-of-3, caches cleared per
  * run (the ProbeRetrieval discipline).
  *
  * Reading the scaled numbers honestly: ScaleGen suffixes every
  * non-gate token per replica, so the per-lang vocabulary (q117) and
  * the reference-slice LM (q118) grow ~LINEARLY with the replica
  * count — the worst case for the broadcast legs, since a real
  * corpus's vocabulary grows sublinearly (Heaps) and a production LM
  * slice is a FIXED curated sample whose broadcast does not grow with
  * the corpus at all. The ladder therefore bounds the true scaling
  * from above on exactly the legs that matter.
  *
  * Usage: ProbeLm [dir]
  */
object ProbeLm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")
    println(s"docs=${docs.count()}")

    def time(tag: String)(run: => Long): Unit = {
      run // warm (plan compile + codegen)
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = run
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$tag: ${ts.map(_._1).min}%.2fs (rows ${ts.head._2}; " +
        s"runs ${ts.map(t => f"${t._1}%.2f").mkString(", ")})")
    }

    time("normalizedGroups")(Dedup.normalizedGroups(docs).count())
    time("perLangSurprisalGate")(
      TextAnalysis.perLangSurprisalGate(docs).count())
    time("stupidBackoff")(TextAnalysis.stupidBackoff(docs).count())
    // mixture over whatever sources exist (ScaleGen carries source
    // through) — six mapped, rest dropped, the q119 shape
    time("mixtureBudget")(Sampling.mixtureBudget(docs,
      Map("src0" -> 300L, "src1" -> 300L, "src2" -> 200L,
        "src3" -> 100L, "src4" -> 50L, "src5" -> 50L))
      .filter(col("keep")).count())

    // blocklist: the 7-phrase q120 list, a 10k-phrase list through
    // the same one-pass kernel, and the 7-phrase per-phrase Column
    // fold as the baseline the kernel replaced (a 10k fold does not
    // plan at all — the scale claim lives in MatchExpressionsSpec)
    val q120Phrases = Seq("fast merge", "fast", "hash value",
      "agg row scan", "table table", "slow spark", "spark window")
    // sum(n_hits), not count(): a bare count prunes the projection
    // and times nothing
    time("blocklist(7)")(
      TextAnalysis.blocklistFilter(docs, q120Phrases)
        .agg(sum(col("n_hits"))).head().getLong(0))
    val big = (q120Phrases ++ (1 to 9993).map(i => s"blk${i}q")).distinct
    time("blocklist(10k)")(
      TextAnalysis.blocklistFilter(docs, big)
        .agg(sum(col("n_hits"))).head().getLong(0))
    time("blocklist(7) fold baseline") {
      val hits = q120Phrases.map { p =>
        val q = java.util.regex.Pattern.quote(p)
        ((length(lower(col("text"))) -
          length(regexp_replace(lower(col("text")), q, ""))) /
          p.length).cast("long")
      }.reduce(_ + _)
      docs.select(hits.as("n_hits"))
        .agg(sum(col("n_hits"))).head().getLong(0)
    }

    // scrub: the q121 list through the one-pass kernel, a 10k list,
    // and the replace-chain Column baseline (each stage a full
    // regexp_replace scan of the whole text — the |phrases| scans the
    // kernel collapses). sum(length + n_bytes) forces the scrubbed
    // string itself to materialize.
    val scrubPhrases = Seq("fast", "fast merge", "hash value", "value",
      "table table", "spark window")
    time("scrub(6)")(
      TextAnalysis.blocklistScrub(docs, scrubPhrases)
        .agg(sum(length(col("scrubbed")) + col("n_masked_bytes")))
        .head().getLong(0))
    val bigScrub =
      (scrubPhrases ++ (1 to 9994).map(i => s"blk${i}q")).distinct
    time("scrub(10k)")(
      TextAnalysis.blocklistScrub(docs, bigScrub)
        .agg(sum(length(col("scrubbed")) + col("n_masked_bytes")))
        .head().getLong(0))
    time("scrub(6) replace-chain baseline") {
      val scrubbed = scrubPhrases.foldLeft(lower(col("text"))) {
        (t, p) => regexp_replace(t,
          java.util.regex.Pattern.quote(p), "*" * p.length)
      }
      docs.select(scrubbed.as("scrubbed"))
        .agg(sum(length(col("scrubbed")))).head().getLong(0)
    }

    // component attribution for the normalizedGroups cost: raw md5
    // agg (q20 shape), the canonical-key projection alone, and the
    // full op without the variant count
    time("  exactGroups(md5 only)")(Dedup.exactGroups(docs).count())
    time("  canonicalKey projection")(docs
      .select(Dedup.canonicalKey(col("text")).as("ck"))
      .filter(col("ck").isNotNull).count())
    time("  canon agg, no variants")(docs
      .groupBy(md5(Dedup.canonicalKey(col("text"))).as("h"))
      .agg(count(lit(1))).count())

    // model-size diagnostics for the broadcast-leg story
    val slice = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
    val sliceBigrams = slice
      .select(explode(graft.functions.TextFunctions.wordShingles(
        split(trim(lower(col("text"))), "\\s+"), 2,
        distinct = false)).as("bg"))
      .select(countDistinct(col("bg"))).head().getLong(0)
    val perLangVocab = docs
      .select(col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .select(countDistinct(col("lang"), col("t"))).head().getLong(0)
    println(s"model sizes: sliceBigramVocab=$sliceBigrams " +
      s"perLangVocab=$perLangVocab")
    spark.stop()
  }
}
