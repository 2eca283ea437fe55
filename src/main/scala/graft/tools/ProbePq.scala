package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Pq

/** Scale ladder for the PQ family (q84/q85/q87 shapes): encode, ADC
  * top-k, and two-stage rerank over a ScaleGen corpus ladder.
  *
  * Usage: ProbePq [dir]  (default /root/testdata/sf0.1)
  * Env: PROBE_NQ (default 20), PROBE_K (5), PROBE_SHORTLIST (50),
  *      SPARK_GRAFT_CPUS (32).
  *
  * What to read from the output: encode is a single scan (should
  * track corpus size ~linearly with a fixed per-row cost of
  * ksub·d fused FLOPs); ADC scales as n·nQ m-add score rows into the
  * per-query top-k window; rerank adds one broadcast semi-join fetch
  * of nQ·R full vectors — independent of n. */
object ProbePq {
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
    val n = e.count()
    val nQ = sys.env.getOrElse("PROBE_NQ", "20").toInt
    val k = sys.env.getOrElse("PROBE_K", "5").toInt
    val shortlist = sys.env.getOrElse("PROBE_SHORTLIST", "50").toInt
    val cfg = Pq.PqConfig(m = 8, ksub = 128, bitsPerCode = 7, dim = 64)
    println(s"vectors=$n nQ=$nQ k=$k shortlist=$shortlist " +
      s"cfg=(m=${cfg.m}, ksub=${cfg.ksub}, bits=${cfg.bitsPerCode})")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: rows=$rows%d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val cb = Pq.sampleCodebooks(e, cfg)
    time("encode")(Pq.encode(e, cb, cfg.bitsPerCode).count())
    time("adcTopK")(Pq.adcTopK(e, cfg, nQ, k).count())
    time("rerankTopK")(Pq.adcRerankTopK(e, cfg, nQ, k, shortlist).count())
    time("ivfPqTopK")(Pq.ivfPqTopK(e, cfg, cellSize = 64, nProbe = 4,
      nQ, k, shortlist).count())
    // the serving DEFAULT: cell size derived by the √n/nProbe law, so
    // assignment and candidate work both track n^1.5 — the path whose
    // x100 behaviour the 100-TB posture actually rides on
    time("ivfPqTopKAuto")(Pq.ivfPqTopKAuto(e, cfg, nProbe = 4,
      nQ, k, shortlist).count())
    spark.stop()
  }
}
