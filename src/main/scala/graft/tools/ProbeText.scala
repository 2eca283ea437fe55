package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.{Bpe, TextAnalysis}

/** Scale ladder for the round-11 text operators (q91/q92/q93 shapes):
  * reference-overlap scoring, BPE merge training, and the tokenizer
  * applied, over a ScaleGen corpus ladder.
  *
  * Usage: ProbeText [dir]  (default /root/testdata/sf0.1)
  *
  * What to read from the output: q91's reference slice grows WITH the
  * corpus (source = src0 is 1/20th of it), so the broadcast vocabulary
  * grows linearly but stays tiny in absolute terms; BPE's per-merge
  * cost is vocabulary-sized (ScaleGen's per-replica token suffixes
  * grow the vocab ~linearly with replicas — the honest worst case,
  * since a real corpus's vocab grows sublinearly by Heaps' law). */
object ProbeText {
  def main(args: Array[String]): Unit = {
    val dir = args.filterNot(_ == "batched-only").headOption
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.engine.Tables.floored(spark, dir, "documents", "doc_id")
    println(s"docs=${d.count()}")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: rows=$rows%d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val batchedOnly = args.contains("batched-only")
    if (!batchedOnly) {
      time("referenceOverlap")(
        TextAnalysis.referenceOverlapScore(d, "src0", minDf = 2).count())
      var merges: Seq[String] = Nil
      time("bpeTrain(6)") {
        merges = Bpe.trainMerges(d, steps = 6)
          .orderBy("step").collect().map(_.getString(1)).toSeq
        merges.size.toLong
      }
      time("bpeApply")(Bpe.subwordCounts(d, merges).count())
    }
    // batching amortization: same merge budget, strict (batch=1,
    // 24 scheduler rounds) vs batched (batch=8, 3 rounds). Read the
    // per-merge amortized cost: total/merges — the batched number
    // should drop ~batch-fold, since each round's data cost is
    // vocabulary-bounded either way and only the fixed per-round
    // scheduler overhead divides.
    for (b <- Seq(1, 8)) {
      val t0 = System.nanoTime()
      val n = Bpe.trainMergesBatched(d, steps = 24, batch = b).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"bpeTrainBatched(steps=24,batch=$b): merges=$n%d " +
        f"t=$t%.2fs per-merge=${t / math.max(n, 1)}%.3fs")
    }
    // production step counts (round-12 verdict task: the 30k-merge
    // claim extrapolated from 24 merges): a >=1000-step budget at
    // production batch sizes, with the driver heap ceiling sampled
    // throughout — the number the plan-string OOM (and the pin-leak
    // fix, which releases one vocab copy per round) made boundable.
    // Delivered merges are reported alongside requested steps: rounds
    // keep only pairwise-disjoint pairs and never backfill, so a
    // conflict-heavy early vocabulary delivers fewer (the documented
    // trade; see Bpe.trainMergesBatched scaladoc).
    if (sys.env.get("PROBE_BPE_PROD").exists(_.nonEmpty)) {
      val steps = sys.env.getOrElse("PROBE_BPE_STEPS", "1024").toInt
      val peak = new java.util.concurrent.atomic.AtomicLong(0L)
      @volatile var sampling = true
      val sampler = new Thread(() => {
        val rt = Runtime.getRuntime
        while (sampling) {
          val used = rt.totalMemory() - rt.freeMemory()
          peak.updateAndGet(p => math.max(p, used))
          Thread.sleep(100)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      for (b <- Seq(64, 256)) {
        peak.set(0L)
        val t0 = System.nanoTime()
        val got = Bpe.trainMergesBatched(d, steps = steps, batch = b)
          .collect()
        val t = (System.nanoTime() - t0) / 1e9
        val rounds = got.map(_.getInt(1)).distinct.length
        println(f"bpeTrainBatchedProd(steps=$steps,batch=$b): " +
          f"merges=${got.length}%d rounds=$rounds%d t=$t%.1fs " +
          f"per-merge=${t / math.max(got.length, 1)}%.3fs " +
          f"driverHeapPeak=${peak.get / (1024.0 * 1024.0)}%.0fMB")
      }
      sampling = false
    }
    spark.stop()
  }
}
