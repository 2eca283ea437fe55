package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: naive every-shared-shingle pairing vs the prefix-filtered
  * exact Jaccard on a boilerplate-heavy corpus (every doc shares one
  * phrase — the df² blowup case). Asserts result parity and prints
  * wall times + candidate counts. */
object ProbePrefix {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(3000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // every doc: a 6-token shared boilerplate prefix + 20 unique tokens;
    // docs 2i/2i+1 in the first 100 are near-dups of each other
    val docs = (0 until nDocs).map { i =>
      val shared = "terms of service apply to everything"
      val unique =
        if (i < 100 && i % 2 == 1)
          (0 until 20).map(j => s"u${i - 1}_$j").mkString(" ") + s" tail$i"
        else (0 until 20).map(j => s"u${i}_$j").mkString(" ")
      (i.toLong, s"$shared $unique")
    }.toDF("doc_id", "text")
    docs.cache().count()

    // naive: full inverted-index self-join (the pre-round-7 plan)
    var t0 = System.nanoTime()
    val sh = graft.ops.Dedup.shingleIndex(docs).cache()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val naivePairs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
      .join(cnt.as("x"), col("doc_a") === col("x.doc_id"))
      .join(cnt.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("jacc", col("common").cast("double") /
        (col("x.n") + col("y.n") - col("common")))
      .filter(col("jacc") >= 0.5)
      .select(col("doc_a"), col("doc_b")).cache()
    val naiveN = naivePairs.count()
    val tNaive = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val pref = graft.ops.Dedup.ngramJaccardPairs(docs, 0.5)
      .select(col("doc_a"), col("doc_b")).cache()
    val prefN = pref.count()
    val tPref = (System.nanoTime() - t0) / 1e9

    val diff = naivePairs.exceptAll(pref).count() + pref.exceptAll(naivePairs).count()
    println(f"docs=$nDocs naive: $naiveN%d pairs in $tNaive%.1fs | prefix: $prefN%d pairs in $tPref%.1fs | diff=$diff")
    println(if (diff == 0 && naiveN == prefN) "PARITY_OK" else "PARITY_FAIL")
    spark.stop()
  }
}
