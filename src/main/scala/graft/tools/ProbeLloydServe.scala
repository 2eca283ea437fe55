package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{IvfIndex, Pq}

/** Refined-vs-sample coarse quantizer at EQUAL probe cost — the
  * number that says what the q102 Lloyd loop buys the q94 serving
  * layout: same cellSize, same nProbe, same shortlist, only the
  * quantizer trained vs sampled.
  *
  * Usage: ProbeLloydServe [dir] (default /root/testdata/sf0.1)
  */
object ProbeLloydServe {
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
    // `ladder` mode: q102's 3-iteration train over ScaleGen corpora
    // (args: ladder <dir1> <dir2> ...) — the scale-law row. Per-sweep
    // work is the n·k assignment; stats/update state is k·dim rows.
    if (args.headOption.contains("ladder")) {
      args.drop(1).foreach { d =>
        val emb = graft.engine.Tables(spark, d, "embeddings")
        val t0 = System.nanoTime()
        val rows = IvfIndex.lloydTrainStats(emb, targetCellSize = 64,
          iters = 3).count()
        println(f"ladder $d: stats_rows=$rows " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      spark.stop()
      return
    }

    val e = graft.engine.Tables(spark, dir, "embeddings")
    val cfg = Pq.PqConfig(m = 8, ksub = 128, bitsPerCode = 7, dim = 64)
    val (nQ, k, shortlist) = (50, 5, 50)
    val cellSize = 64

    def compareOn(corpus: DataFrame, tag: String): Unit = {
      def recallOn(cents: DataFrame, kCells: Long, nProbe: Int): (Long, Long) = {
        val cb = Pq.sampleCodebooks(corpus, cfg)
        val indexed = Pq.placeAndEncode(corpus, cents, kCells, cb, cfg)
        val served = Pq.ivfPqServe(indexed, corpus, cents, kCells, cb,
            cfg, nProbe, nQ, k, shortlist)
          .select(col("query_id").as("iq"), col("vec_id").as("iv"))
        val ex = Pq.exactL2TopK(corpus, nQ, k).select("query_id", "vec_id")
        val hits = ex.join(served, ex("query_id") === served("iq") &&
            ex("vec_id") === served("iv")).count()
        val sizes = indexed.groupBy("cell").count()
        val qb = corpus.filter(col("vec_id") < nQ)
          .select(col("vec_id"), col("embedding").as("v"))
        val cand = IvfIndex.assignViaJoin(qb, cents, nProbe = nProbe,
            kEstimate = Some(kCells))
          .join(sizes, Seq("cell")).agg(sum("count")).head().getLong(0)
        (hits, cand)
      }
      val (sample, kc) = IvfIndex.sampleQuantizerDf(corpus, cellSize)
      val (refined, iters) = IvfIndex.refineCentroidsConverged(corpus,
        sample, maxIters = 10, kEstimate = Some(kc))
      for (nProbe <- Seq(2, 4)) {
        val t0 = System.nanoTime()
        val (rs, cs) = recallOn(sample, kc, nProbe)
        val t1 = System.nanoTime()
        val (rr, cr) = recallOn(refined, kc, nProbe)
        val t2 = System.nanoTime()
        println(f"$tag nProbe=$nProbe sample_recall=$rs/${nQ * k} cand=$cs " +
          f"refined_recall=$rr/${nQ * k} cand=$cr lloyd_iters=$iters " +
          f"t_sample=${(t1 - t0) / 1e9}%.2fs t_refined=${(t2 - t1) / 1e9}%.2fs")
      }
    }

    compareOn(e, "uniform")
    // clustered corpus (the regime IVF training exists for): 64 far
    // gaussian clusters, 5000 members total
    locally {
      import spark.implicits._
      val rnd = new scala.util.Random(23)
      val centers = Array.fill(64)(Array.fill(64)(rnd.nextGaussian() * 8))
      // contiguous blocks: the lowest-k sample seed then covers only
      // the first couple of clusters — the adversarial init Lloyd
      // training exists to escape (an id%64 layout would hand the
      // sample one seed per cluster and nothing to measure)
      val rows = (0 until 5000).map { id =>
        val c = centers(id / 79)
        (id.toLong, c.map(x => (x + rnd.nextGaussian()).toFloat).toSeq)
      }
      compareOn(rows.toDF("vec_id", "embedding"), "clustered")
    }
    spark.stop()
  }
}
