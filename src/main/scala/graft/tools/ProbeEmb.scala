package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Candidate-density probe for q27 (embedding near-dup, LSH + rerank)
  * at a given sf/scale dir — the round-7 verdict asked whether the
  * 12.7x wall at x30 data is CANDIDATE INFLATION (the band join
  * admitting superlinearly many pairs, a plan problem fixable by
  * widening bitsPerBand) or the local resource ceiling (768 partitions
  * on 32 cores, a harness artifact). Candidates/vector at each scale
  * answers it: ScaleGen preserves intra-replica cosine structure
  * exactly and decorrelates cross-replica pairs, so a TRUE linear scale
  * path keeps candidates/vector ~constant; growth means the 64-bit
  * 2-bit-band signature admits cross-replica collisions at scale.
  *
  * Usage: ProbeEmb <dir> — prints one summary line per stage.
  */
object ProbeEmb {
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
    val e = graft.engine.Tables(spark, dir, "embeddings")

    var t0 = System.nanoTime()
    val sigs = Similarity.lshSignatures(e, Similarity.hyperplanes(64, 64))
      .withColumn("nrm", Similarity.l2norm(col("v")))
      .filter(col("nrm") > 0d).cache()
    val nVecs = sigs.count()
    println(f"vectors=$nVecs%d  allPairs=${nVecs * (nVecs - 1) / 2}%d" +
      f"  t=${(System.nanoTime() - t0) / 1e9}%.1fs")

    // cheap at any scale: pre-distinct pair mass Σ_buckets C(sz, 2) —
    // an aggregate over band rows, no pair expansion
    t0 = System.nanoTime()
    val nBands = 64 / 2
    val mask = (1L << 2) - 1
    val bandStructs = (0 until nBands).map { j =>
      struct(lit(j).as("band_idx"),
        shiftright(col("sig"), 2 * j).bitwiseAND(lit(mask)).as("band_val"))
    }
    val mass = sigs.select(explode(array(bandStructs: _*)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("sz"))
      .agg(sum(col("sz") * (col("sz") - 1))).head().getLong(0) / 2
    println(f"bandPairMass=$mass%d  t=${(System.nanoTime() - t0) / 1e9}%.1fs")

    // exact distinct candidate count + rerank: quadratic output, skip
    // at scales where the point is already made (SKIP_EXACT=1)
    if (!sys.env.get("SKIP_EXACT").contains("1")) {
      t0 = System.nanoTime()
      val cand = Similarity.bandCandidates(sigs, 64, 2).cache()
      val nCand = cand.count()
      println(f"candidates=$nCand%d  perVec=${nCand.toDouble / nVecs}%.1f" +
        f"  t=${(System.nanoTime() - t0) / 1e9}%.1fs")

      t0 = System.nanoTime()
      val payload = sigs.select(col("vec_id"), col("v"), col("nrm"))
      val survivors = cand
        .join(payload.as("x"), col("vec_a") === col("x.vec_id"))
        .join(payload.as("y"), col("vec_b") === col("y.vec_id"))
        .select((Similarity.dot(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm"))).as("sim"))
        .filter(col("sim") >= 0.4).count()
      println(f"survivors=$survivors%d  rerankT=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
