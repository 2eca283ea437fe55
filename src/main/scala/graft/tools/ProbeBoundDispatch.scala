package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Hashing, Retrieval, VocabJoin}

/** Interleaved same-JVM A/B for the round-18 BOUND vocab dispatch
  * (r17 verdict item 4): production tfidfKeywords / clusterKeywords
  * (one HLL bound action + the serving action) vs the pre-round-18
  * EXACT-count dispatch (VocabJoin.plan's count, which evaluated the
  * whole corpus-sized df lineage once beyond the serving action).
  * The exact twin is the FROZEN old form — transcribed here because
  * it no longer exists in production; row parity is asserted against
  * the production output each run, so the twin cannot drift
  * unnoticed. ProbeNbSinglePass discipline: interleaved reps,
  * cache + plan cache cleared per rep, min per side.
  *
  * Usage: ProbeBoundDispatch [dir] [reps]  (default /root/testdata/sf0.1 4) */
object ProbeBoundDispatch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")
      .select("doc_id", "text", "lang", "source")
    println(s"=== $dir: ${docs.count()} docs, $reps interleaved reps/side")

    def clear(): Unit = { spark.catalog.clearCache()
      spark.sharedState.cacheManager.clearCache() }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- the frozen pre-r18 exact-dispatch twins ----
    def tfidfExact(m: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val tf = docs
        .select(col("doc_id"), explode(Hashing.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val idf = Hashing.idiv(lit(1000000L) *
        (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)),
        lit(2L) * col("df") + lit(1L))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_x1M").desc, col("token"))
      VocabJoin.join(tf, df, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("token"), col("tf"),
          (col("tf") * idf).as("score_x1M"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= m)
        .select(col("doc_id"), col("rank"), col("token"), col("tf"),
          col("score_x1M"))
    }
    def clusterExact(clusters: DataFrame, m: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val tagged = docs
        .join(clusters.select(col("doc_id"), col("cluster_root")), "doc_id")
        .select(col("cluster_root"), explode(Hashing.tokens(col("text"))).as("token"))
      val tf = tagged.groupBy(col("cluster_root"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val nGroups = clusters.select(col("cluster_root")).distinct()
        .agg(count(lit(1)).as("n_groups"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val idf = Hashing.idiv(lit(1000000L) *
        (lit(2L) * col("n_groups") - lit(2L) * col("df") + lit(1L)),
        lit(2L) * col("df") + lit(1L))
      val w = Window.partitionBy("cluster_root")
        .orderBy(col("score_x1M").desc, col("token"))
      VocabJoin.join(tf, df, Seq("token"))
        .crossJoin(broadcast(nGroups))
        .select(col("cluster_root"), col("token"), col("tf"),
          (col("tf") * idf).as("score_x1M"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= m)
        .select(col("cluster_root"), col("rank"), col("token"), col("tf"),
          col("score_x1M"))
    }

    // the REGISTERED q136 shape passes the raw dupClusters lineage —
    // the exact-count dispatch therefore re-evaluated the whole LSH
    // clustering chain for its count action; both sides here consume
    // the same raw frame so the A/B measures exactly that
    val clusters = Dedup.dupClusters(docs, 0.8, bucketCap = Some(16))
      .select("doc_id", "cluster_root")

    // ---- parity ----
    clear()
    val pa = Retrieval.tfidfKeywords(docs, 3).orderBy("doc_id", "rank")
      .collect().toSeq
    val pb = tfidfExact(3).orderBy("doc_id", "rank").collect().toSeq
    require(pa == pb, "tfidf bound-vs-exact parity broke")
    clear()
    val ca = Retrieval.clusterKeywords(docs, clusters, 3)
      .orderBy("cluster_root", "rank").collect().toSeq
    val cb = clusterExact(clusters, 3).orderBy("cluster_root", "rank")
      .collect().toSeq
    require(ca == cb, "cluster bound-vs-exact parity broke")
    println(s"[parity] tfidf ${pa.size} rows, cluster ${ca.size} rows — twins agree")

    val shapes: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("q131_tfidf",
        () => noop(Retrieval.tfidfKeywords(docs, 3)),
        () => noop(tfidfExact(3))),
      ("q136_cluster",
        () => noop(Retrieval.clusterKeywords(docs, clusters, 3)),
        () => noop(clusterExact(clusters, 3))))
    shapes.foreach { case (tag, a, b) =>
      clear(); a(); clear(); b() // warm-up
      val as = Array.fill(reps)(0.0); val bs = Array.fill(reps)(0.0)
      (0 until reps).foreach { r =>
        clear(); as(r) = time(a())
        clear(); bs(r) = time(b())
        println(f"[$tag] rep$r bound ${as(r)}%6.2f s  exact ${bs(r)}%6.2f s")
      }
      println(f"[$tag] MIN bound ${as.min}%6.2f s  exact ${bs.min}%6.2f s  " +
        f"speedup ${bs.min / as.min}%5.2fx")
    }
    spark.stop()
  }
}
