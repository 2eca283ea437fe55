package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the streaming gate harnesses (round 14's
  * drain-amortization work): wave prep vs the drain itself vs the
  * read-back, plus Spark job counts per phase — the numbers that say
  * whether the residual per-query cost is plan compilation, job
  * scheduling, or harness I/O. Run: PROBE_SF_DIR=... ProbeDrainCost. */
object ProbeDrainCost {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[drain-cost] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get() - j0}")
      r
    }

    val root = new java.io.File("target/graft-wh/probe-drain")
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    val src = s"$root/src"; val ckpt = s"$root/ckpt"; val wh = s"$root/wh"

    val events = graft.engine.Tables(spark, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_micros"),
        col("event_id").cast("long").as("event_id"))
    val row = phase("bounds agg")(
      events.agg(min("ts_micros"), max("ts_micros")).head())
    val (tMin, tMax) = (row.getLong(0), row.getLong(1))
    val mid = tMin + (tMax - tMin) / 2
    val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    phase("wave writes x3") {
      Seq((tMin - 1, mid), (mid, tMax + 1)).zipWithIndex.foreach {
        case ((lo, hi), w) =>
          events.filter(col("ts_micros") > lo && col("ts_micros") <= hi)
            .coalesce(1).write.mode("append").parquet(src)
      }
      events.select(col("user_id")).distinct()
        .withColumn("ts_micros", lit(tMax + 86400L * 1000000L))
        .withColumn("event_id", lit(-1L))
        .select("user_id", "ts_micros", "event_id")
        .coalesce(1).write.mode("append").parquet(src)
      val fs = new java.io.File(src).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
      fs.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1000000000000L + i * 60000L) }
    }
    phase("drain (1 query, mfpt=1)") {
      graft.streaming.StatefulSessionize.run(spark, src, 30, wh,
        "probe_sessions", ckpt, timeout = false,
        maxFilesPerTrigger = Some(1))
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevSp)
    phase("read-back + sort") {
      graft.engine.TableStore.read(spark, wh, "probe_sessions")
        .orderBy("user_id", "start_micros").count()
    }
    // second lifecycle, warm JVM: what a steady-state rerun costs
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    phase("RERUN waves") {
      Seq((tMin - 1, mid), (mid, tMax + 1)).foreach { case (lo, hi) =>
        events.filter(col("ts_micros") > lo && col("ts_micros") <= hi)
          .coalesce(1).write.mode("append").parquet(src)
      }
      events.select(col("user_id")).distinct()
        .withColumn("ts_micros", lit(tMax + 86400L * 1000000L))
        .withColumn("event_id", lit(-1L))
        .select("user_id", "ts_micros", "event_id")
        .coalesce(1).write.mode("append").parquet(src)
      val fs = new java.io.File(src).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified())
      fs.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1000000000000L + i * 60000L) }
    }
    phase("RERUN drain") {
      graft.streaming.StatefulSessionize.run(spark, src, 30, wh,
        "probe_sessions", ckpt, timeout = false,
        maxFilesPerTrigger = Some(1))
    }
    spark.conf.set("spark.sql.shuffle.partitions", prevSp)
    phase("RERUN read-back") {
      graft.engine.TableStore.read(spark, wh, "probe_sessions")
        .orderBy("user_id", "start_micros").count()
    }
    spark.stop()
  }
}
