package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{Checkpoints, Tables}
import graft.queries.Capstone

/** Stage-by-stage wall + cardinality ladder for the q147 curation
  * capstone v2 — built from [[graft.queries.Capstone]]'s SHARED stage
  * builders (the same code the Registry entry runs, so the ladder
  * cannot drift from the gated composition). Each stage is counted so
  * the ladder shows WHERE documents die and which exchanges carry the
  * surviving cardinality; pins/caches materialize inside their
  * stage's timer, so the printed walls attribute honestly.
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
      val emb = Tables(spark, dir, "embeddings")
      val t0 = System.nanoTime()
      val clean = t("1-3 gates+length+scrub") {
        val c = Capstone.cleanDocs(docs); c.count(); c
      }
      val nClean = clean.count()
      // PROBE_BENCH_DIR pins the decontam bench to ANOTHER dir's
      // %10=3 embeddings slice (the production shape: a constant-size
      // eval set that does not grow with the corpus) — the
      // corpus-linearity point of the ladder; default is the gated
      // law (bench = this dir's own slice, growing with the corpus)
      val dec = t("4   decontam (pin)") {
        sys.env.get("PROBE_BENCH_DIR") match {
          case Some(bd) =>
            val bench = Tables(spark, bd, "embeddings")
              .filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 3)
            println(s"[capstone]   (bench pinned to $bd: " +
              s"${bench.count()} vectors)")
            Capstone.decontamWith(clean, emb, bench, 900000L)
          case None => Capstone.decontam(clean, emb)
        }
      }
      val nDec = dec.count()
      // PROBE_TRUST_DIR pins the NB TRAIN corpus to ANOTHER dir's
      // post-decontam %10=7 slice (the production shape: a trusted
      // labeled corpus is constant-size and external — it does not
      // grow 100× with the data being gated), so stage 5's train-side
      // stats frames are constant and only the scoring pass scales;
      // default is the gated law (train = this corpus's own slice)
      val sel1 = t("5   NB gate (pin)") {
        sys.env.get("PROBE_TRUST_DIR") match {
          case Some(td) =>
            import org.apache.spark.sql.functions.{col, pmod, lit}
            val tClean = Capstone.cleanDocs(
              Tables.floored(spark, td, "documents", "doc_id")
                .select("doc_id", "text", "lang", "source"))
            val tDec = Capstone.decontam(tClean,
              Tables(spark, td, "embeddings"))
            val trust = tDec.filter(pmod(col("doc_id"), lit(10L)) === 7)
            println(s"[capstone]   (NB train pinned to $td %10=7: " +
              s"${trust.count()} docs)")
            val r = Capstone.nbGateTrust(dec, trust)
            tClean.unpersist(blocking = false)
            Checkpoints.release(tDec)
            r
          case None => Capstone.nbGate(dec)
        }
      }
      val nSel1 = sel1.count()
      val sel2 = t("6   CE select (pin)")(Capstone.ceSelect(sel1))
      val nSel2 = sel2.count()
      val keep = t("7   capped dedup (pin)")(Capstone.dedupKeep(sel2))
      val nRoots = keep.count()
      val train = t("8   split (cache)") {
        val tr = Capstone.trainSplit(keep, sel2); tr.count(); tr
      }
      val nTrain = train.count()
      val packed = t("9-10 mix + pack (pin)")(Capstone.pack(train))
      val nPacked = packed.count()
      println(f"[capstone] TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        s"clean=$nClean dec=$nDec nb=$nSel1 ce=$nSel2 roots=$nRoots " +
        s"train=$nTrain packed=$nPacked")
      clean.unpersist(blocking = false)
      train.unpersist(blocking = false)
      Seq(dec, sel1, sel2, keep, packed).foreach(Checkpoints.release)
    }
    spark.stop()
  }
}
