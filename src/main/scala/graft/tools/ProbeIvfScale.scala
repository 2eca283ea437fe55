package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{IvfIndex, Similarity}

/** Scale-shape probe for the IVF pair path (q74's shape): per scale
  * dir, times `IvfIndex.nearDupPairs` at threshold 0.45 under (a) the
  * registered FIXED 16-cell pinned quantizer — expected to go
  * quadratic once cells outgrow executors, it exists for oracle
  * replay — and (b) the production config, `trainOnSample` with
  * k ~ n/256 — the Σ n_c² ≈ n·cellSize·nProbe² law the operator's
  * scaladoc claims. PROBE_FIXED=0 skips (a). */
object ProbeIvfScale {
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
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: pairs=$rows%d t=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    println(s"vectors=$n")
    if (!sys.env.get("PROBE_FIXED").contains("0")) {
      val ks = sys.env.getOrElse("PROBE_KS", "16").split(',').map(_.toInt)
      val norm = sys.env.get("PROBE_NORM").contains("1")
      for (pk <- ks) {
        val pinned = Similarity.hyperplanes(pk, 64, seed = 7L).zipWithIndex
          .map { case (c, i) =>
            val s = if (norm) math.sqrt(c.map(x => x * x).sum) else 1.0
            (i, c.map(_ / s).toSeq)
          }
        time(s"fixed$pk norm=$norm")(
          IvfIndex.nearDupPairs(e, 0.45, pinned, 2).count())
      }
    }
    val k = math.max(16, (n / 256).toInt)
    val t0 = System.nanoTime()
    val trained = IvfIndex.trainOnSample(e, k, 3)
    println(f"train k=$k: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val nProbes = sys.env.getOrElse("PROBE_NPROBE", "2").split(',').map(_.toInt)
    for (np <- nProbes)
      time(s"scaled k=$k nProbe=$np")(
        IvfIndex.nearDupPairs(e, 0.45, trained, np).count())
    if (sys.env.get("PROBE_EXACT").contains("1"))
      time("exact blocked")(Similarity.allPairsBlocked(e, 0.45).count())
    spark.stop()
  }
}
