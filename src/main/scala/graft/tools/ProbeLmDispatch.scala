package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Hashing.{idiv, tokens}
import graft.ops.TextAnalysis

/** A/B of unigramSurprisal's (q115) PLAN SHAPES, isolating where the
  * post-dispatch form spends relative to the round-13 single-action
  * form. Background: round 14 replaced q115's 1-row crossJoined W
  * frame with a driver `head()` so the vocabulary row count could
  * feed VocabJoin's dispatch without plan()'s extra count job — but
  * the head() is a SECOND ACTION, and actions do not share exchange
  * reuse: the corpus tokenize+groupBy subtree evaluates once per
  * action. The round-13 single-action form evaluated it once (the
  * W subtree and the vocab probe reuse one exchange inside one
  * action). Variants:
  *
  *   current      — TextAnalysis.unigramSurprisal as registered
  *   singleAction — W via crossJoin(broadcast(1-row agg)), vocab
  *                  broadcast unconditionally, NO driver action
  *                  (the r13 shape)
  *   cachedCounts — the current two-action form but with the counts
  *                  frame cached across them (one corpus pass + one
  *                  cache read)
  *
  * All three must return identical rows (asserted). Usage:
  * ProbeLmDispatch [dir]. */
object ProbeLmDispatch {

  /** r13 shape: one action, exchange-reuse eligible. */
  def singleAction(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val counts = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val w = counts.agg(sum(col("c")).as("w"))
    val vocab = counts.crossJoin(broadcast(w))
      .select(col("t"),
        (length(bin(idiv(col("w"), col("c")))) - 1)
          .cast("long").as("bits"))
    tok.join(broadcast(vocab), Seq("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits")).as("surprisal_bits"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_bits"),
        idiv(lit(1000L) * col("surprisal_bits"),
          greatest(col("n_tokens"), lit(1L))).as("bits_x1000_per_token"))
  }

  /** current two-action form + counts cached across the actions. */
  def cachedCounts(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val counts = tok.groupBy("t").agg(count(lit(1)).as("c")).cache()
    val agg = counts.agg(sum(col("c")).as("w"), count(lit(1)).as("nv")).head()
    val (wTotal, nVocab) =
      (if (agg.isNullAt(0)) 0L else agg.getLong(0), agg.getLong(1))
    val vocab = counts.select(col("t"),
      (length(bin(idiv(lit(wTotal), col("c")))) - 1)
        .cast("long").as("bits"))
    tok.join(graft.ops.VocabJoin.planFromCount(vocab, nVocab)(vocab),
        Seq("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits")).as("surprisal_bits"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_bits"),
        idiv(lit(1000L) * col("surprisal_bits"),
          greatest(col("n_tokens"), lit(1L))).as("bits_x1000_per_token"))
  }

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

    def time(tag: String)(build: => DataFrame): Seq[String] = {
      val warm = build.orderBy("doc_id").collect().map(_.toString).toSeq
      val ts = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-14s min ${ts.min}%.2fs  " +
        s"(runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
      warm
    }

    val a = time("current")(TextAnalysis.unigramSurprisal(docs))
    val b = time("singleAction")(singleAction(docs))
    val c = time("cachedCounts")(cachedCounts(docs))
    require(a == b && b == c,
      s"variants diverge: current=${a.size} single=${b.size} cached=${c.size}")
    println(s"rows identical across variants: ${a.size}")
    spark.stop()
  }
}
