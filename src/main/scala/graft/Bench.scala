package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name: sec}}.
  *
  * Results are forced through the "noop" sink so the full plan executes
  * (a bare count() lets Spark skip projections); each query runs after a
  * JVM/session warm-up query so JIT noise lands on the warm-up, not the
  * measurements.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    def jsonLine(results: Seq[(String, Double)]): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    val outFile = sys.env.get("SPARK_GRAFT_BENCH_OUT")
    def writeOut(line: String): Unit = outFile.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // two timed runs per query, min reported: single-run numbers at
    // local[32] carry +-5s of GC/codegen noise; min-of-2 measures the
    // steady-state plan cost the cross-round comparison cares about.
    // Caches clear between DIFFERENT queries (no cross-query storage
    // accumulation or reuse) but not between a query's two runs — the
    // second run measures warm marginal cost, first run absorbs the
    // one-time Janino/codegen compilation.
    //
    // Storage release between queries must go BELOW the catalog:
    // eagerly localCheckpoint'ed results (q23/q27/q35/q46/q51...) pin
    // RDD blocks that spark.catalog.clearCache() never sees, and at 55
    // queries x local[32] the accumulated blocks built enough GC
    // pressure to inflate innocent queries 3-4x past even min-of-2
    // (BENCH_r04 q29 3.35 s vs 0.78 s isolated). getPersistentRDDs is
    // the SparkContext-level registry that does include them; blocking
    // unpersist + an explicit GC hint drains the heap before the next
    // query's timer starts.
    def releaseStorage(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // SPARK_GRAFT_BENCH_ONLY (comma list of name substrings) narrows the
    // run for local iteration on a single query's plan.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').toSeq.filter(_.nonEmpty))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.contains)))
    // warm-up with the first FILTERED query: JIT + parquet footer
    // caches on the code paths that are actually about to be measured
    names.take(1).foreach(runOne)
    var done = List.empty[(String, Double)]
    val results = names.map { n =>
      releaseStorage()
      System.err.println(s"[bench] $n ...")
      val t1 = runOne(n)
      val t2 = runOne(n)
      // -1.0 when EITHER run fails: a flaky query must be visible in the
      // JSON, not hidden behind its one successful run
      val t = if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2)
      System.err.println(f"[bench] $n: $t%.2f s")
      // flush partial results after every query: if the harness kills
      // this process on a timeout, the file still names the culprit
      done = done :+ (n -> t)
      writeOut(jsonLine(done))
      n -> t
    }
    val line = jsonLine(results)
    // machine-parseable output: always stdout (sole non-log line), plus a
    // clean file copy when SPARK_GRAFT_BENCH_OUT is set, so the harness
    // never has to regex the JSON out of sbt/log4j noise
    println(line)
    writeOut(line)
    spark.stop()
  }
}
