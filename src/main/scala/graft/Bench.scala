package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE compact JSON line {"metric":...,"queries":{name: sec}} as
  * the LAST stdout line (the driver tail-captures ~2000 chars of stdout,
  * so the line must stay small and last — BENCH_r07.json went
  * `parsed: null` when the probes object rode on the same line and
  * pushed it past the window).
  *
  * Results are forced through the "noop" sink so the full plan executes
  * (a bare count() lets Spark skip projections).
  *
  * == Isolation model (round-7 fix for the full-run inflation) ==
  *
  * Rounds 4-6 showed the shared-session full run inflating individual
  * queries 2-4x over fresh-session runs of the same bytes (r5 vs r6:
  * identical code scored 52.5 s then 45.0 s; judge-isolated q23 2.49 s vs
  * 4.41 s full-run, q35 1.62 s vs 5.44 s). The in-session
  * clearCache + unpersist + System.gc() release was not enough: the
  * remaining accumulators are JVM-global (old-gen heap growth and GC
  * time, metaspace/codegen classes, block-manager disk dirs), which no
  * catalog-level release touches. So the default mode now runs EVERY
  * query in its own SparkSession — stop the context, rebuild, warm up,
  * measure — making each full-run measurement a fresh-session
  * measurement by construction, i.e. identical methodology to an
  * isolated `SPARK_GRAFT_BENCH_ONLY=<name>` invocation (which creates a
  * session, warm-runs the one query, then times two runs).
  *
  * Per query: one warm-up run (absorbs Janino/codegen compilation and
  * parquet footer reads), then two timed runs, min reported — the
  * steady-state plan cost the cross-round comparison cares about.
  *
  * == Self-diagnosis ==
  *
  * A SEPARATE {"probes":{...}} JSON line (stderr + the
  * SPARK_GRAFT_BENCH_OUT file, never stdout) carries, per query, the two
  * raw run times, plus, when the two runs disagree by >1.5x, a third run
  * in ANOTHER fresh session ("reprobe") and a "stable" flag. A regressed
  * plan shows consistent times across all probes; harness noise shows
  * one outlier run settled by two agreeing runs — tellable apart from
  * the JSON alone.
  *
  * == Diagnosis modes ==
  *
  * SPARK_GRAFT_BENCH_SHARED=1 restores the legacy single-session run
  * (with the catalog-level release between queries) so the inflation
  * remains reproducible; SPARK_GRAFT_BENCH_DIAG=1 prints per-query
  * JVM/storage counters (GC time delta, metaspace, loaded classes,
  * storage memory, block-manager disk bytes) to stderr in either mode.
  * The round-7 diagnosis run with both flags named the accumulators:
  * monotonically growing GC time per query and metaspace/class count
  * (numbers in PLANS.md round-7 section).
  */
object Bench {
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  // Shuffle partitions default to the core count — right for the
  // driver's sf0.1 runs. Scale-law experiments (ScaleGen corpora)
  // override via SPARK_GRAFT_SHUFFLE_PARTITIONS: at 10x volume, 32
  // partitions put 10x in each task's sorter/aggregator and spills go
  // superlinear, which measures the local resource ceiling, not the
  // plan (a real cluster scales partitions with data).
  private val shufflePartitions =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)

  private def newSession(): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def runOne(spark: SparkSession, name: String): Double = {
    // Spark's cache manager dedupes by LOGICAL PLAN: an operator that
    // materializes its result via cache+count (Checkpoints.materialize)
    // would hand every run after the warm-up the warm-up's cached
    // blocks, timing a cache read instead of the plan. Clear between
    // runs so each timed run pays the full steady-state cost
    // (within-run reuse — an operator reading its own caches — is
    // legitimate and unaffected).
    spark.catalog.clearCache()
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] $name failed: ${e.getMessage}")
      return -1.0
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** warm-up + two timed runs inside `spark`; (t1, t2). */
  private def measure(spark: SparkSession, name: String): (Double, Double) = {
    runOne(spark, name)
    (runOne(spark, name), runOne(spark, name))
  }

  // ---- diagnosis instrumentation (SPARK_GRAFT_BENCH_DIAG=1) ----

  private val diag = sys.env.get("SPARK_GRAFT_BENCH_DIAG").contains("1")

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  private def dirBytes(d: java.io.File): Long =
    if (!d.exists) 0L
    else if (d.isFile) d.length
    else Option(d.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)

  /** Bytes under this JVM's block-manager / spark temp dirs — shuffle
    * files, disk-spilled blocks, broadcast disk copies. */
  private def sparkLocalBytes: Long = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("blockmgr-") ||
        f.getName.startsWith("spark-"))
      .map(dirBytes).sum
  }

  private def diagLine(spark: SparkSession, tag: String,
                       gc0: Long): Unit = if (diag) {
    import scala.jdk.CollectionConverters._
    import java.lang.management.{ManagementFactory => mf}
    val meta = mf.getMemoryPoolMXBeans.asScala
      .find(_.getName.contains("Metaspace")).map(_.getUsage.getUsed / 1e6)
      .getOrElse(-1.0)
    val classes = mf.getClassLoadingMXBean.getLoadedClassCount
    val heap = mf.getMemoryMXBean.getHeapMemoryUsage.getUsed / 1e6
    val storage = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, free) => max - free }.sum / 1e6
    System.err.println(
      f"[diag] $tag: gc+=${gcMillis - gc0}%dms heap=$heap%.0fMB " +
        f"meta=$meta%.0fMB classes=$classes%d storageMem=$storage%.0fMB " +
        f"localDirs=${sparkLocalBytes / 1e6}%.0fMB")
  }

  // ---- legacy shared-session release (kept for the diagnosis mode) ----

  private def releaseStorage(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }

  final case class Probe(t1: Double, t2: Double,
                         reprobe: Option[Double]) {
    def runs: Seq[Double] = Seq(t1, t2) ++ reprobe
    // a query is failed only if NO run succeeded: a transient
    // third-run (reprobe) failure must not discard two good
    // measurements — reprobes fire exactly under the flaky
    // conditions where a one-off failure is most likely
    private def ok: Seq[Double] = runs.filter(_ >= 0)
    def best: Double = if (ok.isEmpty) -1.0 else ok.min
    // Without a reprobe: both runs must agree within 1.5x. With a
    // reprobe (which only fires BECAUSE the first two disagreed), the
    // question is whether the third run settled the dispute: if any
    // two of the three runs agree within 1.5x, the odd one out is
    // classified as harness noise and the query is stable. The raw
    // runs are emitted alongside, so the driver can re-derive either
    // reading.
    def stable: Boolean = ok.size == runs.size && {
      val s = ok.sorted
      if (reprobe.isEmpty) s.last <= s.head * 1.5
      else s.sliding(2).exists(p => p(1) <= p(0) * 1.5)
    }
  }

  // Locale.ROOT: the f-interpolator honors the JVM default locale,
  // and a comma decimal separator (de_DE, tr_TR, ...) would
  // corrupt the machine-parseable JSON
  private def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The compact driver-facing line: metric/value/queries/sf only.
    * Round 7 taught us the driver tail-captures the last ~2000 stdout
    * chars; a single line carrying the per-query probes object outgrew
    * that window at 65 queries and the driver recorded `parsed: null`.
    * This line is ALWAYS the last stdout line of a successful run, and
    * it DEGRADES per-query precision (2 → 1 → 0 decimals) when the
    * registry grows the line toward the window, so the driver keeps
    * parsing a complete map instead of going blind — BenchLineSpec
    * pins the budget against registry growth. The probes line keeps 3
    * decimals regardless. */
  def compactLine(results: Seq[(String, Probe)], sf: String): String = {
    def build(dec: Int, slim: Boolean): String = {
      def n(v: Double) = s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)
      val qs = results.map { case (k, p) => "\"" + k + "\":" + n(p.best) }
        .mkString("{", ",", "}")
      val total = results.map(_._2.best).filter(_ >= 0).sum
      // total keeps 2 decimals always — one value, cross-round headline
      val t = "%.2f".formatLocal(java.util.Locale.ROOT, total)
      val sfv = if (slim) sf.split('/').last else sf
      val unit = if (slim) "" else """"unit":"sec","""
      s"""{"metric":"total","value":$t,$unit"queries":$qs,"sf":"$sfv"}"""
    }
    val levels = Seq((2, false), (1, false), (0, false), (0, true))
    levels.iterator.map((build _).tupled).find(_.length < 1900)
      .getOrElse(build(0, slim = true))
  }

  /** The self-diagnosis payload (raw runs, reprobes, stable flags) —
    * too fat for the driver's tail capture, so it goes to stderr and
    * the SPARK_GRAFT_BENCH_OUT file, never stdout. */
  def probesLine(results: Seq[(String, Probe)]): String = {
    val probes = results.map { case (k, p) =>
      val re = p.reprobe.map(r => ",\"reprobe\":" + num(r)).getOrElse("")
      "\"" + k + "\":{\"runs\":[" + num(p.t1) + "," + num(p.t2) + "]" +
        re + ",\"stable\":" + p.stable + "}"
    }.mkString("{", ",", "}")
    s"""{"probes":$probes}"""
  }

  def main(args: Array[String]): Unit = {
    val shared = sys.env.get("SPARK_GRAFT_BENCH_SHARED").contains("1")
    val outFile = sys.env.get("SPARK_GRAFT_BENCH_OUT")
    // SPARK_GRAFT_BENCH_ONLY (comma list of name substrings) narrows the
    // run for local iteration on a single query's plan.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.contains)))

    def compact(results: Seq[(String, Probe)]): String =
      compactLine(results, sfDir)
    // The out-file always carries BOTH lines (compact first, probes
    // second) so a human or tool reading it gets the full picture.
    def writeOut(results: Seq[(String, Probe)]): Unit = outFile.foreach { p =>
      val body = compact(results) + "\n" + probesLine(results) + "\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    var done = List.empty[(String, Probe)]
    if (shared) {
      // legacy mode: one session for the whole pass, catalog-level
      // release between queries — reproduces the r4-r6 inflation for
      // diagnosis
      val spark = newSession()
      names.take(1).foreach(n => runOne(spark, n)) // global warm-up
      names.foreach { n =>
        releaseStorage(spark)
        val gc0 = gcMillis
        System.err.println(s"[bench] $n ...")
        val t1 = runOne(spark, n)
        val t2 = runOne(spark, n)
        diagLine(spark, n, gc0)
        val p = Probe(t1, t2, None)
        System.err.println(f"[bench] $n: ${p.best}%.2f s")
        done = done :+ (n -> p)
        writeOut(done)
      }
      spark.stop()
    } else {
      // default: fresh session per query == isolated-run methodology
      names.foreach { n =>
        System.err.println(s"[bench] $n ...")
        val spark = newSession()
        val gc0 = gcMillis
        val (t1, t2) = measure(spark, n)
        diagLine(spark, n, gc0)
        spark.stop()
        // two runs disagreeing >1.5x = noise suspected; settle it with a
        // third run in another fresh session
        val needReprobe = t1 >= 0 && t2 >= 0 &&
          math.max(t1, t2) > math.min(t1, t2) * 1.5
        val reprobe = if (needReprobe) {
          val s2 = newSession()
          val r = { runOne(s2, n); runOne(s2, n) }
          s2.stop()
          Some(r)
        } else None
        val p = Probe(t1, t2, reprobe)
        System.err.println(
          f"[bench] $n: ${p.best}%.2f s (stable=${p.stable})")
        // flush partial results after every query: if the harness kills
        // this process on a timeout, the file still names the culprit
        done = done :+ (n -> p)
        writeOut(done)
      }
    }
    // Machine-parseable output contract: the COMPACT line is the LAST
    // stdout line (the driver tail-captures ~2000 chars and json-parses
    // the final line); the probes diagnosis goes to stderr and the
    // SPARK_GRAFT_BENCH_OUT file only, never stdout.
    System.err.println(probesLine(done))
    println(compact(done))
    writeOut(done)
  }
}
