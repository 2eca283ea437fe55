package graft.streaming

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming/batch sessionize parity on the REAL events table (sf0.1):
  * the stateful streaming operator, fed the full table as chronological
  * micro-batches (the file-source arrival order), must emit exactly the
  * sessions the batch q41 window computation produces.
  *
  * Final open sessions are closed by a per-user sentinel event far
  * beyond the gap: the sentinel closes the real session and itself
  * stays open in the state store (append mode never emits it), so the
  * emitted set needs no filtering.
  */
class StreamingParitySpec extends SparkSpec {
  import spark.implicits._
  import StatefulSessionize._

  test("streaming sessions == batch q41 over the full sf0.1 events table") {
    val sfDir = "/root/testdata/sf0.1"
    val src = tmpDir("sess-parity-src")
    val ckpt = tmpDir("sess-parity-ckpt")
    val out = tmpDir("sess-parity-out")

    val events = Tables(spark, sfDir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_micros"),
        col("event_id").cast("long").as("event_id"))
      .as[Ev].cache()

    val (tMin, tMax) = events.agg(min("ts_micros"), max("ts_micros"))
      .as[(Long, Long)].head()

    def drain(): Unit = {
      val in = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
        .parquet(src).as[Ev]
      val q = StatefulSessionize.sessions(in, gapMinutes = 30)
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Session], _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // four chronological batches (strict time ranges, so equal-ts ties
    // never straddle a batch boundary), each drained separately so
    // cross-batch state is genuinely exercised
    val cuts = (1 to 3).map(i => tMin + (tMax - tMin) * i / 4)
    val ranges = (Seq(tMin - 1) ++ cuts).zip(cuts ++ Seq(tMax + 1))
    ranges.foreach { case (lo, hi) =>
      events.filter(col("ts_micros") > lo && col("ts_micros") <= hi)
        .write.mode("append").parquet(src)
      drain()
    }

    // sentinel batch: one event per user, far beyond any gap
    events.groupBy("user_id")
      .agg((max(col("ts_micros")) + 86400L * 1000000L).as("ts_micros"))
      .withColumn("event_id", lit(-1L))
      .select("user_id", "ts_micros", "event_id").as[Ev]
      .write.mode("append").parquet(src)
    drain()

    val streamed = spark.read.parquet(out).as[Session].collect()
      .map(s => (s.user_id, s.start_micros, s.end_micros, s.n_events.toLong))
      .toSet

    val batch = graft.queries.Registry.queries("q41_sessionize")(spark, sfDir)
      .select(col("user_id").cast("long"),
        unix_micros(col("session_start")), unix_micros(col("session_end")),
        col("n_events").cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet

    events.unpersist()
    assert(streamed.size === batch.size)
    assert(streamed === batch)
  }
}
