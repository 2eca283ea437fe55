package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scale-shape probe for q69 as registered (planted corpus, 0.7
  * threshold): per scale dir, prints vector count, band-bucket pair
  * mass (pre-distinct candidate upper bound, computed as an aggregate
  * — no pair expansion), distinct candidates, and surviving pairs.
  * Distinguishes candidate inflation (superlinear mass growth — a
  * corpus-artifact or config problem) from a flat-mass wall (local
  * resource ceiling). PROBE_PLANES / PROBE_BITS select the config
  * (defaults: the registered 128 / 16).
  */
object ProbeQ69Scale {
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
    val nPlanes = sys.env.getOrElse("PROBE_PLANES", "128").toInt
    val bitsPerBand = sys.env.getOrElse("PROBE_BITS", "16").toInt
    val e = graft.engine.Tables(spark, dir, "embeddings")
    val planted = Similarity.plantNearDups(e, 50)

    var t0 = System.nanoTime()
    val sigs = Similarity
      .lshSignatureWords(planted, Similarity.hyperplanes(nPlanes, 64))
      .withColumn("nrm", Similarity.l2norm(col("v")))
      .filter(col("nrm") > 0d).cache()
    val nVecs = sigs.count()
    println(f"planes=$nPlanes%d bits=$bitsPerBand%d vectors=$nVecs%d" +
      f"  sigT=${(System.nanoTime() - t0) / 1e9}%.1fs")

    val nBands = nPlanes / bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    val bandStructs = (0 until nBands).map { j =>
      val w = (bitsPerBand * j) / 64
      val off = (bitsPerBand * j) % 64
      struct(lit(j).as("band_idx"),
        shiftright(element_at(col("sigw"), w + 1), off)
          .bitwiseAND(lit(mask)).as("band_val"))
    }
    t0 = System.nanoTime()
    val byBucket = sigs.select(explode(array(bandStructs: _*)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("sz"))
    val mass = byBucket.agg(sum(col("sz") * (col("sz") - 1))).head().getLong(0) / 2
    val top = byBucket.orderBy(desc("sz")).limit(5)
      .collect().map(_.getLong(1)).mkString(",")
    println(f"bandPairMass=$mass%d  top5Buckets=$top%s" +
      f"  t=${(System.nanoTime() - t0) / 1e9}%.1fs")

    if (!sys.env.get("SKIP_EXACT").contains("1")) {
      t0 = System.nanoTime()
      val cand = Similarity.bandCandidatesWords(sigs, nPlanes, bitsPerBand).cache()
      val nCand = cand.count()
      println(f"candidates=$nCand%d  perVec=${nCand.toDouble / nVecs}%.2f" +
        f"  t=${(System.nanoTime() - t0) / 1e9}%.1fs")
      t0 = System.nanoTime()
      val payload = sigs.select(col("vec_id"), col("v"), col("nrm"))
      val pairs = cand
        .join(payload.as("x"), col("vec_a") === col("x.vec_id"))
        .join(payload.as("y"), col("vec_b") === col("y.vec_id"))
        .select((Similarity.dot(col("x.v"), col("y.v")) /
          (col("x.nrm") * col("y.nrm"))).as("sim"))
        .filter(col("sim") >= 0.7).count()
      println(f"pairs=$pairs%d  rerankT=${(System.nanoTime() - t0) / 1e9}%.1fs")
      cand.unpersist(blocking = false)
    }
    sigs.unpersist(blocking = false)
    spark.stop()
  }
}
