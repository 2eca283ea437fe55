package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew audit for the capped-dedup candidate join (r18 verdict
  * item 5; guide §2.5): the stage-7 / q67 / q113 / q133 kernel joins
  * the band stream to itself on (band_idx, band_val) after dropping
  * buckets larger than the cap, so per-key candidate work is bounded
  * by C(cap, 2) BY CONSTRUCTION — the open question the verdict
  * raised is whether the bucket-occupancy DISTRIBUTION still lands
  * the shuffle's partitions unevenly (many near-cap buckets hashing
  * together). This probe measures, on the real kernel's band stream:
  *
  *   - the bucket-size histogram (pre-cap), the oversized-drop count,
  *     and Σ C(size, 2) = the exact candidate-pair volume;
  *   - the per-shuffle-partition candidate volume (max/median/top-5)
  *     under the same hash partitioning the join uses — the direct
  *     answer to "does one partition dominate" (a max/median ≳ 5–10×
  *     is the guide's skew threshold).
  *
  * Usage: ProbeDedupSkew [dir] [cap] [partitions]
  *   (default /tmp/scale_x100 16 32) */
object ProbeDedupSkew {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale_x100"
    val cap = if (args.length > 1) args(1).toInt else 16
    val parts = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")
      .select("doc_id", "text", "lang", "source")
    println(s"=== $dir: ${docs.count()} docs, cap=$cap, partitions=$parts")

    // the REAL kernel's band stream (shingle index → signatures →
    // bands), via the production entry points
    val sh = graft.ops.Dedup.shingleIndex(docs)
    val sigs = graft.ops.Dedup.minhashSignaturesFromIndex(sh)
    val bands = graft.ops.Dedup.lshBands(sigs)
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("bsz"))
      .cache()

    val hist = bands.groupBy("bsz").agg(count(lit(1)).as("n_buckets"))
      .orderBy("bsz").collect()
    println("[hist] bucket-size -> n_buckets (pre-cap):")
    hist.foreach(r => println(f"[hist]   ${r.getLong(0)}%6d -> ${r.getLong(1)}%10d"))
    val dropped = bands.filter(col("bsz") > cap)
    val nDropped = dropped.count()
    val pairsDropped = dropped.agg(sum((col("bsz") * (col("bsz") - 1) / 2).cast("long")))
      .head().getLong(0)
    val kept = bands.filter(col("bsz") <= cap)
    val pairVolume = kept.agg(sum((col("bsz") * (col("bsz") - 1) / 2).cast("long")))
      .head()
    println(s"[cap] oversized buckets dropped: $nDropped " +
      s"(pair volume removed: $pairsDropped)")
    println(s"[cap] kept candidate-pair volume ΣC(bsz,2): ${pairVolume.get(0)}")

    // per-partition volume under the join's own hash partitioning:
    // repartition the kept buckets exactly as the equi-join would and
    // sum each partition's pair volume
    val perPart = kept
      .repartition(parts, col("band_idx"), col("band_val"))
      .select(spark_partition_id().as("p"),
        ((col("bsz") * (col("bsz") - 1) / 2).cast("long")).as("pairs"))
      .groupBy("p").agg(sum(col("pairs")).as("pairs"))
      .orderBy(col("pairs").desc).collect()
    val vols = perPart.map(_.getLong(1)).sorted.reverse
    val median = vols(vols.length / 2)
    println(f"[skew] partitions=${vols.length} max=${vols.head} " +
      f"median=$median ratio=${vols.head.toDouble / math.max(median, 1)}%.2f")
    println(s"[skew] top-5 partition pair volumes: ${vols.take(5).mkString(", ")}")
    bands.unpersist(blocking = false)
    spark.stop()
  }
}
