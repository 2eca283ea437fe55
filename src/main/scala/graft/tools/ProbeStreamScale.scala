package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** x1/x30/x100 event-scale ladder for the two round-14 streaming
  * additions: q143's stream-stream interval join and q145's native
  * session windows — the older streaming family was laddered at 10M
  * events in round 13; this closes the gap for the new pair.
  *
  * Each point replays the gated harness exactly (chronological waves
  * as single mtime-pinned files, maxFilesPerTrigger=1, the q145
  * common-instant sentinel) and reports the drain wall, the PEAK
  * state-store rows across micro-batches (max over progress events of
  * Σ stateOperators.numRowsTotal — for the interval join this is the
  * retained view+click state the watermark bounds; for session
  * windows the open-session rows), and the emitted row count.
  *
  * What the ladder should show at 100 TB rates: wall ~linear in
  * events (each event is touched once per store), state bounded by
  * watermark·rate — NOT by stream length — so the x100 state/event
  * ratio must not grow. ScaleGen replicates events by shifting
  * user_id/event_id ranges with ts untouched, so per-user temporal
  * structure (and hence per-key state lifetime) is scale-invariant by
  * construction; what grows is the KEY count, the honest variable.
  *
  * Usage: ProbeStreamScale [dir ...]
  *   (default /root/testdata/sf0.1 /tmp/scale_x30 /tmp/scale_x100) */
object ProbeStreamScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/scale_x30", "/tmp/scale_x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // noDataMicroBatches stays at its DEFAULT (true) — the gated
    // harness runs with it, and the native session drain NEEDS the
    // final empty batch to emit sessions ending within the trailing
    // watermark delay of the sentinel batch's watermark. Rounds 14-15
    // disabled it here and the ladder silently undercounted q145's
    // sessions by that tail (95,344 vs the batch law's 95,465 at
    // sf0.1) while the gated path was correct all along.

    // the arrival harness is the GATE's own
    // ([[graft.streaming.WaveHarness]]) — shared code, not a
    // transcription, so the ladder measures exactly what the gated
    // queries run (round-16 self-review)
    import graft.streaming.WaveHarness.{writeWave, writeSessionWaves}

    /** One AvailableNow drain; returns (wall s, peak state rows, rows
      * emitted). State partitions default to the gated queries' 4 —
      * the q105/q107 sizing — so the ladder measures state GROWTH
      * under the exact shape the gate runs; PROBE_STATE_PARTITIONS
      * overrides it to show the 100-TB knob (state partitions must
      * scale with KEYS: 4 partitions at 10M events is 2.5M state rows
      * per store task, the measured q145 superlinearity). */
    def drainTimed(streamed: DataFrame, outDir: String,
                   ckpt: String): (Double, Long, Long) = {
      val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_STATE_PARTITIONS", "4"))
      val t0 = System.nanoTime()
      val q = streamed.writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.shuffle.partitions", prevSp)
      val peakState = q.recentProgress
        .map(p => p.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      (wall, peakState, spark.read.parquet(outDir).count())
    }

    dirs.foreach { dir =>
      val root = new java.io.File("target/graft-wh/probe-stream-scale")
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      val ev = graft.engine.Tables(spark, dir, "events")
        .select(col("event_id").cast("long").as("event_id"), col("ts"),
          col("user_id").cast("long").as("user_id"), col("event_type"))
      val nEv = ev.count()
      val mm = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head()
      val (tMin, tMax) = (mm.getLong(0), mm.getLong(1))
      val midUs = tMin + (tMax - tMin) / 2
      println(s"=== $dir: $nEv events")

      // ── q143 shape: all views + first-half clicks in batch 1,
      // second-half clicks in batch 2 (cross-batch view state)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"),
          col("user_id").as("v_user"), col("ts").as("view_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("click_ts"))
      writeWave(views, s"$root/views", 0)
      writeWave(clicks.filter(unix_micros(col("click_ts")) < midUs),
        s"$root/clicks", 0)
      writeWave(clicks.filter(unix_micros(col("click_ts")) >= midUs),
        s"$root/clicks", 1)
      val vStream = spark.readStream
        .schema("view_id bigint, v_user bigint, view_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(s"$root/views")
      val cStream = spark.readStream
        .schema("click_id bigint, c_user bigint, click_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(s"$root/clicks")
      val (wJoin, stJoin, nJoin) = drainTimed(
        graft.streaming.StreamingJoin.attributionJoin(
          vStream, cStream, windowMinutes = 30, delayMinutes = 30),
        s"$root/join-out", s"$root/join-ckpt")
      println(f"[stream] q143 interval join  wall=$wJoin%7.2f s  " +
        f"peak_state=$stJoin%9d  matches=$nJoin")

      // ── q145 shape: the gated wave law verbatim (micros-form
      // events through writeSessionWaves; the reader rebuilds the
      // timestamp by exact integer arithmetic, as the gated
      // sessionWindowDrain does)
      val sessM = ev.select(col("user_id"),
        unix_micros(col("ts")).as("ts_micros"), col("event_id"))
      def sessionStream(src: String): DataFrame = spark.readStream
        .schema("user_id bigint, ts_micros bigint, event_id bigint")
        .option("maxFilesPerTrigger", 1).parquet(src)
        .select(col("user_id"), timestamp_micros(col("ts_micros")).as("ts"))
      writeSessionWaves(sessM, s"$root/sess")
      val (wSess, stSess, nSess) = drainTimed(
        graft.streaming.StreamingBuilders.sessionWindowAgg(
          sessionStream(s"$root/sess"), gapMinutes = 30,
          delayMinutes = 30),
        s"$root/sess-out", s"$root/sess-ckpt")
      println(f"[stream] q145 native sessions wall=$wSess%7.2f s  " +
        f"peak_state=$stSess%9d  sessions=$nSess")

      /** q105's flatMapGroupsWithState kernel over the same waves —
        * returns (wall s, sessions). Distinct `tag` per caller so the
        * forced row and the dispatched row never share dirs. */
      def customDrain(tag: String): (Double, Long) = {
        writeSessionWaves(sessM, s"$root/$tag")
        val prevSp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions",
          sys.env.getOrElse("PROBE_STATE_PARTITIONS", "4"))
        val t0 = System.nanoTime()
        graft.streaming.StatefulSessionize.run(spark, s"$root/$tag", 30,
          s"$root/$tag-wh", "probe_sessions", s"$root/$tag-ckpt",
          timeout = false, maxFilesPerTrigger = Some(1))
        val wC = (System.nanoTime() - t0) / 1e9
        spark.conf.set("spark.sql.shuffle.partitions", prevSp)
        val nC = graft.engine.TableStore
          .read(spark, s"$root/$tag-wh", "probe_sessions").count()
        (wC, nC)
      }

      // PROBE_CUSTOM_SESSIONIZE=1 adds the FORCED kernel row — the
      // native-vs-custom wall at this event scale (different sink:
      // foreachBatch upsert, like the gated q105)
      if (sys.env.contains("PROBE_CUSTOM_SESSIONIZE")) {
        val (wC, nC) = customDrain("sessc")
        println(f"[stream] q105 custom sessions wall=$wC%7.2f s  " +
          f"peak_state=        -  sessions=$nC")
      }

      // ── the DISPATCHED serving default (q148's law, round 16): the
      // SessionDispatch probe picks the branch, and the row reports
      // probe wall + a fresh end-to-end drain of the chosen branch —
      // what a deployment actually pays at this event scale
      {
        val sessP = ev.select(col("user_id"), col("ts"))
        val tP = System.nanoTime()
        val est = graft.streaming.SessionDispatch.estimatedSessions(
          sessP, 30, graft.streaming.SessionDispatch.probeSampleMod(sessP))
        val native = est <= graft.streaming.SessionDispatch
          .maxNativeSessions(sessP)
        val wProbe = (System.nanoTime() - tP) / 1e9
        val (branch, wD, nD) =
          if (native) {
            // the q145 block above already wrote these exact waves
            // into $root/sess — streaming isolation lives in the
            // ckpt/out dirs, so re-drain from the same source files
            // instead of paying a second full wave write (round-16
            // self-review)
            val (w, _, n) = drainTimed(
              graft.streaming.StreamingBuilders.sessionWindowAgg(
                sessionStream(s"$root/sess"), gapMinutes = 30,
                delayMinutes = 30),
              s"$root/sessd-out", s"$root/sessd-ckpt")
            ("native", w, n)
          } else {
            val (w, n) = customDrain("sessd")
            ("kernel", w, n)
          }
        println(f"[stream] q148 dispatched($branch%6s) wall=${wProbe + wD}%7.2f s " +
          f"(probe $wProbe%5.2f + drain $wD%7.2f)  est_sessions=$est  " +
          f"sessions=$nD")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(root)
    }
    spark.stop()
  }
}
