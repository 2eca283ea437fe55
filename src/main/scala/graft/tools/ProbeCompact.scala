package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for the q128 postings lifecycle
  * (build → absorb ×2 → compact → serve), two rounds so the second
  * shows warm steady-state. Round-14 numbers (sf0.1, quiet): warm
  * build 1.2 s / absorb ~1.0 s each / compact 0.48 s / serve 0.46 s —
  * the deterministic one-file-per-bucket repartition added ~0.4 s to
  * compact vs the cache-copy form it replaced (the priced trade:
  * one exchange instead of a second full index in the block store). */
object ProbeCompact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.engine.Tables(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pc] $tag%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r }
    for (round <- 1 to 2) {
      val wh = s"target/graft-wh/probe-compact$round"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
      t("build 80%")(graft.ops.Retrieval.buildPostingsIndex(
        d.filter(col("doc_id") % 10 < 8), wh, "p", 8))
      t("absorb 10%")(graft.ops.Retrieval.absorbIntoPostingsIndex(
        graft.engine.TableStore.bucketedName(spark, wh, "p"), wh, "p",
        d.filter(col("doc_id") % 10 === 8)))
      t("absorb 10%")(graft.ops.Retrieval.absorbIntoPostingsIndex(
        graft.engine.TableStore.bucketedName(spark, wh, "p"), wh, "p",
        d.filter(col("doc_id") % 10 === 9)))
      t("compact")(graft.ops.Retrieval.compactPostingsIndex(spark, wh, "p", 8))
      t("serve")(graft.ops.Retrieval.bm25TopKFromIndex(
        spark.table(graft.engine.TableStore.bucketedName(spark, wh, "p")),
        spark.read.parquet(graft.engine.TableStore.tablePath(wh, "p_stats")),
        Seq("the", "and"), 25).collect())
    }
    spark.stop()
  }
}
