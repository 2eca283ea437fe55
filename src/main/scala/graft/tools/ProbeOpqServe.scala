package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Covariance, Pq}

/** Rotated-vs-unrotated IVF-PQ SERVING recall (the q104 composition)
  * measured on both regimes the operator can meet:
  *
  *  - the ANISOTROPIC corpus (8 dominant directions at 10x energy —
  *    the shape OPQ's eigenvalue allocation exists to balance), where
  *    the rotation should lift recall at an equal candidate budget;
  *  - the driver's UNIFORM test embeddings, where rotation has no
  *    variance to balance and the honest expectation is no lift.
  *
  * Prints one line per (corpus, nProbe, shortlist) cell:
  * sum(ivfpq_hits) vs sum(rot_hits) against the unrotated exact
  * top-k over nQ=20, k=5. Backs the PLANS.md q104 row.
  *
  * Usage: ProbeOpqServe [dir]  (default /root/testdata/sf0.1)
  */
object ProbeOpqServe {
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
    import spark.implicits._

    val cfg = Pq.PqConfig(m = 8, ksub = 16, bitsPerCode = 4, dim = 64)

    // the CovarianceSpec anisotropic corpus, seeded
    val rnd = new scala.util.Random(31)
    val aniso = (0 until 2000).map { id =>
      (id.toLong, Array.tabulate(64)(i =>
        (rnd.nextGaussian() * (if (i % 8 == 0) 10.0 else 1.0)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val uniform = graft.engine.Tables(spark, dir, "embeddings")

    def cell(tag: String, d: org.apache.spark.sql.DataFrame,
             nProbe: Int, shortlist: Int): Unit = {
      val r = Covariance.pcaRotationRR(d, cfg.m)
      val t0 = System.nanoTime()
      val row = Pq.ivfPqRecallAutoRotated(d, cfg, r, nProbe,
          nQueries = 20, k = 5, shortlist = shortlist)
        .agg(sum(col("exact_k")), sum(col("ivfpq_hits")),
          sum(col("rot_hits")))
        .collect()(0)
      println(f"$tag nProbe=$nProbe shortlist=$shortlist: " +
        f"exact=${row.getLong(0)} raw=${row.getLong(1)} " +
        f"rotated=${row.getLong(2)} t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    // shortlist=k is the regime where the ADC ORDER is the ranking
    // (no rerank forgiveness) — where code fidelity, the one loss
    // source rotation can fix, is fully exposed; larger shortlists
    // let the exact rerank hide it (and cell-probing loss, the other
    // source, is rotation-invariant: an orthonormal rotation moves
    // corpus and centroids together)
    Seq((4, 5), (4, 15), (2, 30), (4, 50)).foreach { case (p, sl) =>
      cell("aniso(n=2000)", aniso, p, sl)
    }
    Seq((4, 5), (4, 50)).foreach { case (p, sl) =>
      cell(s"uniform($dir)", uniform, p, sl)
    }
    spark.stop()
  }
}
