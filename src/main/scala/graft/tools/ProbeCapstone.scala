package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Checkpoints, Tables}
import graft.ops.{Dedup, Packing, Sampling, Similarity, TextAnalysis}

/** Stage-by-stage wall + cardinality ladder for the q147 curation
  * capstone v2 (the ten-stage DCLM/FineWeb-shaped pipe): heuristic
  * gates → length gate → scrub → embedding decontamination → NB
  * quality gate → cross-entropy selection → capped dedup → split →
  * temperature mix → packing. Exactly the registered composition,
  * with each stage counted so the ladder shows WHERE documents die
  * and which exchanges carry the surviving cardinality.
  *
  * Usage: ProbeCapstone [dir ...]
  *   (default /root/testdata/sf0.1 /tmp/scale_x30) */
object ProbeCapstone {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale_x30")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[capstone] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    dirs.foreach { dir =>
      spark.catalog.clearCache()
      val docs = Tables.floored(spark, dir, "documents", "doc_id")
        .select("doc_id", "text", "lang", "source")
      println(s"=== $dir: ${docs.count()} docs")
      val t0 = System.nanoTime()
      val gated = docs.filter(TextAnalysis.qualityKeep(col("text")))
      val sized = TextAnalysis.lengthGateRetained(gated).filter(col("keep"))
      val clean = sized.select(col("doc_id"),
        TextAnalysis.scrubText(col("text")).as("text"),
        col("lang"), col("source")).cache()
      val nClean = t("1-3 gates+length+scrub")(clean.count())
      val e = Tables(spark, dir, "embeddings")
      val contam = Similarity.embeddingContamination(
        e.join(clean.select(col("doc_id").as("vec_id")),
          Seq("vec_id"), "left_semi").filter(col("vec_id") % 10 =!= 3),
        e.filter(col("vec_id") % 10 === 3), tauX1e6 = 900000L)
      val dec = t("4   decontam (pin)")(Checkpoints.pin(
        clean.filter(col("doc_id") % 10 =!= 3)
          .join(contam.select(col("vec_id").as("doc_id"),
            col("keep").as("dc_keep")), Seq("doc_id"), "left")
          .filter(coalesce(col("dc_keep"), lit(true)))
          .drop("dc_keep")))
      val nDec = dec.count()
      val nbKeep = TextAnalysis.nbLangClassifier(dec)
        .filter(col("correct")).select("doc_id")
      val sel1 = t("5   NB gate (pin)")(Checkpoints.pin(
        dec.filter(pmod(col("doc_id"), lit(10L)) === 7)
          .unionByName(dec.join(nbKeep, Seq("doc_id"), "left_semi"))))
      val nSel1 = sel1.count()
      val sel2 = t("6   CE select (pin)") {
        val ceScores = Checkpoints.pin(
          TextAnalysis.crossEntropySelect(sel1,
              col("source") === "src0", buckets = 256, thetaX1000 = 0L)
            .select(col("doc_id"), col("ce_diff_x1000")))
        val mRow = ceScores
          .agg(sum(col("ce_diff_x1000")), count(lit(1))).head()
        val thr = if (mRow.isNullAt(0) || mRow.getLong(1) == 0L) 0L
                  else mRow.getLong(0) / mRow.getLong(1)
        val s2 = Checkpoints.pin(sel1.join(
          ceScores.filter(col("ce_diff_x1000") <= thr).select("doc_id"),
          Seq("doc_id"), "left_semi"))
        Checkpoints.release(ceScores)
        s2
      }
      val nSel2 = sel2.count()
      val (nRoots, train) = t("7-8 capped dedup + split") {
        val cl = Dedup.dupClusters(sel2, 0.8, bucketCap = Some(16))
        val tr = Sampling.withSplit(
            cl.filter(col("keep")).select("doc_id").join(sel2, Seq("doc_id")))
          .filter(col("split") === "train")
          .select("doc_id", "text", "lang").cache()
        (cl.filter(col("keep")).count(), tr)
      }
      val nTrain = train.count()
      val nPacked = t("9-10 mix + pack + materialize") {
        Packing.packChunks(Sampling.withMix(train), 512L,
            keepCols = Seq("lang", "rate_ppm"))
          .orderBy("doc_id")
          .transform(Checkpoints.materialize)
          .count()
      }
      println(f"[capstone] TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        s"clean=$nClean dec=$nDec nb=$nSel1 ce=$nSel2 roots=$nRoots " +
        s"train=$nTrain packed=$nPacked")
      clean.unpersist(blocking = false)
      train.unpersist(blocking = false)
      Seq(dec, sel1, sel2).foreach(Checkpoints.release)
    }
    spark.stop()
  }
}
