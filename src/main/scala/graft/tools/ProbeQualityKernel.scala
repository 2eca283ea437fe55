package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Interleaved same-JVM A/B for the round-18 fused stage-1–3 kernels
  * (QualityKernel / NTokensExpr / RegexScrubExpr) vs the Column
  * chains they replaced — the ProbeNbSinglePass discipline: reps
  * alternate A/B/A/B..., the block cache AND plan cache are cleared
  * per rep, parity is asserted on a checksum, and the MIN per side is
  * the reported number (the host is non-stationary; interleaving
  * cancels drift, min rejects squeezes).
  *
  * Three measured shapes, each a production composition:
  *   gate:  filter(qualityKeep) → count of survivors (stage-1 shape)
  *   clean: Capstone.cleanDocs minus the cache — filter + lengthGate +
  *          scrub, noop-sunk (the stages-1–3 shape)
  *   pii:   piiScrub noop-sunk (q63's shape)
  *
  * Usage: ProbeQualityKernel [dir] [reps]   (default /tmp/scale_x100 3) */
object ProbeQualityKernel {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale_x100"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")
      .select("doc_id", "text", "lang", "source")
    println(s"=== $dir: ${docs.count()} docs, $reps interleaved reps/side")

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sharedState.cacheManager.clearCache()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- parity: survivor sets and scrub checksums must agree ----
    val keepA = docs.filter(TextAnalysis.qualityKeep(col("text"))).count()
    val keepB = docs.filter(TextAnalysis.qualityKeepColumns(col("text"))).count()
    require(keepA == keepB, s"gate parity broke: $keepA vs $keepB")
    val ckA = docs.select(sum(crc32(TextAnalysis.scrubText(col("text"))))).head().getLong(0)
    val ckB = docs.select(sum(crc32(TextAnalysis.scrubTextColumns(col("text"))))).head().getLong(0)
    require(ckA == ckB, s"scrub parity broke: $ckA vs $ckB")
    println(s"[parity] gate survivors $keepA both; scrub crc $ckA both")

    def cleanKernel(): Unit = noop(
      TextAnalysis.lengthGateRetained(
          docs.filter(TextAnalysis.qualityKeep(col("text"))))
        .filter(col("keep"))
        .select(col("doc_id"), TextAnalysis.scrubText(col("text")).as("text"),
          col("lang"), col("source")))
    def cleanColumns(): Unit = noop(
      lengthGateRetainedColumns(
          docs.filter(TextAnalysis.qualityKeepColumns(col("text"))))
        .filter(col("keep"))
        .select(col("doc_id"),
          TextAnalysis.scrubTextColumns(col("text")).as("text"),
          col("lang"), col("source")))

    val shapes: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("gate",
        () => noop(docs.filter(TextAnalysis.qualityKeep(col("text")))
          .select("doc_id")),
        () => noop(docs.filter(TextAnalysis.qualityKeepColumns(col("text")))
          .select("doc_id"))),
      ("clean13", () => cleanKernel(), () => cleanColumns()),
      ("pii",
        () => noop(TextAnalysis.piiScrub(docs)),
        () => noop(TextAnalysis.piiScrubColumns(docs))))

    shapes.foreach { case (tag, a, b) =>
      // one un-timed warm-up per side (codegen/JIT)
      clear(); a(); clear(); b()
      val as = Array.fill(reps)(0.0)
      val bs = Array.fill(reps)(0.0)
      (0 until reps).foreach { r =>
        clear(); as(r) = time(a())
        clear(); bs(r) = time(b())
        println(f"[$tag] rep$r kernel ${as(r)}%6.2f s  columns ${bs(r)}%6.2f s")
      }
      println(f"[$tag] MIN kernel ${as.min}%6.2f s  columns ${bs.min}%6.2f s  " +
        f"speedup ${bs.min / as.min}%5.2fx")
    }
    spark.stop()
  }

  /** lengthGateRetained with the n_tokens column from the LEGACY
    * split-array count — the B-side twin (the production operator now
    * uses the fused counter, so the A/B must rebuild the old shape
    * here; the histogram pass rides the same legacy count). */
  private def lengthGateRetainedColumns(docs: DataFrame): DataFrame = {
    import graft.ops.Hashing.tokens
    val toks = docs.withColumn("n_tokens",
      coalesce(size(tokens(col("text"))).cast("long"), lit(0L)))
    val hist = docs.select(coalesce(size(tokens(col("text"))).cast("long"),
        lit(0L)).as("n_tokens"))
      .groupBy("n_tokens").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("n_tokens")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val cumN = cum.crossJoin(hist.agg(sum(col("cnt")).as("N")))
    def rank(p: Double) = lit(p) * (col("N") - 1).cast("double")
    def k0(p: Double) = floor(rank(p)).cast("long")
    def k1(p: Double) = least(k0(p) + 1, col("N") - 1)
    def vAt(k: org.apache.spark.sql.Column) =
      min(when(col("cum") > k, col("n_tokens")))
    val agg = cumN.agg(
      vAt(k0(0.01)).as("lo0"), vAt(k1(0.01)).as("lo1"),
      vAt(k0(0.99)).as("hi0"), vAt(k1(0.99)).as("hi1"),
      max(col("N")).as("N"))
    def interp(p: Double, v0: org.apache.spark.sql.Column,
               v1: org.apache.spark.sql.Column) =
      v0.cast("double") + (rank(p) - floor(rank(p))) * (v1 - v0).cast("double")
    val bounds = agg.select(
      interp(0.01, col("lo0"), col("lo1")).as("lo"),
      interp(0.99, col("hi0"), col("hi1")).as("hi"))
    toks.crossJoin(broadcast(bounds))
      .withColumn("keep",
        col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
      .withColumn("lo_x100", floor(col("lo") * 100).cast("long"))
      .withColumn("hi_x100", floor(col("hi") * 100).cast("long"))
      .drop("lo", "hi")
  }
}
