package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cardinality probe for the q23 verification stage at a given sf dir:
  * sizes the candidate set and the replicated-join volume so the
  * verification strategy can be chosen from data, not guesses. */
object ProbeCard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables(spark, dir, "documents")

    var t0 = System.nanoTime()
    val sh = graft.ops.Dedup.shingleIndex(docs).cache()
    val shRows = sh.count()
    println(f"shingle index rows=$shRows%d  t=${(System.nanoTime()-t0)/1e9}%.1fs")

    t0 = System.nanoTime()
    val sigs = graft.ops.Dedup.minhashSignaturesFromIndex(sh).cache()
    val nDocs = sigs.count()
    val bands = graft.ops.Dedup.lshBands(sigs)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().cache()
    val nCand = cand.count()
    println(f"docs=$nDocs%d candidates=$nCand%d  t=${(System.nanoTime()-t0)/1e9}%.1fs")

    t0 = System.nanoTime()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val repl = cand.join(cnt.withColumnRenamed("doc_id", "d"),
        col("doc_a") === col("d"))
      .agg(sum(col("n"))).head().getLong(0)
    val docsInPairs = cand.select(col("doc_a").as("d"))
      .union(cand.select(col("doc_b").as("d"))).distinct().count()
    println(f"sum|sh(doc_a)| over pairs=$repl%d  docsInPairs=$docsInPairs%d  t=${(System.nanoTime()-t0)/1e9}%.1fs")

    val dist = cand.groupBy("doc_a").count()
      .agg(max("count"), avg("count")).head()
    println(s"max pairs per doc_a=${dist.get(0)}  avg=${dist.get(1)}")
    spark.stop()
  }
}
