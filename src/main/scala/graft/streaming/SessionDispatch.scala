package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Size-dispatched sessionization serving: picks between the
  * Catalyst-native `session_window` aggregation
  * ([[StreamingBuilders.sessionWindowAgg]]) and the custom
  * flatMapGroupsWithState kernel ([[StatefulSessionize]]) from a
  * cheap measured session-density probe — the
  * [[graft.ops.VocabJoin]] / editVerifiedPairs dispatch pattern
  * applied to streaming state.
  *
  * Why dispatch at all: both paths are gated under ONE oracle
  * (q105/q145/q148 all hash to the same session set), but their
  * state-store shapes diverge hard with session count. The native
  * operator's append-mode state holds every UNEMITTED session and
  * pays a per-micro-batch merge-sort over all of them — measured
  * 44–63 s at 10M events of mostly-singleton sessions (9.5M
  * sessions), 3.1× the kernel's 14.2 s on the same waves, superlinear
  * in session count and insensitive to state partitions
  * (ProbeStreamScale, PLANS "Streaming ladder"). The kernel keeps one
  * OPEN session per user and sorts only each user's batch slice. So:
  * native below the crossover (it is the engine's own operator — the
  * house preference when it expresses the semantics), the kernel
  * above it.
  *
  * The probe estimates TOTAL sessions from a deterministic 1-in-m
  * user sample (`user_id % m = 0` — no randomness, replays
  * identically) run through the batch session law (count of
  * gap-exceeding steps per user, the q41 sessionizer's window form),
  * scaled back by m. For the AvailableNow backfill drain — the
  * serving shape the gated queries run — total sessions IS the
  * native store's peak burden (the watermark only advances at wave
  * boundaries); for a long-running low-latency stream the same
  * budget reads as sessions per watermark horizon, and the probe
  * frame is the retained history or first batch. Cost: one window
  * aggregation over |events|/m rows, paid once before the drain.
  *
  * Budget default 500k sessions, now bracketed by MEASURED rungs on
  * both sides (round 17 bisected the former 95k→2.86M gap; PLANS
  * "Streaming ladder" tables, all rungs on the shared-WaveHarness
  * re-measured numbers — the round-16 harness fix superseded the r15
  * "native ahead at x1" reading): native-vs-kernel wall is 3.5/2.8 s
  * at 95k sessions, 6.0/5.0 at 286k, 5.8/3.3 at 955k, 12.9/4.4 at
  * 2.86M, 48.5/12.5 at 9.5M. On this corpus shape the kernel is
  * never worse at ANY rung — the budget's job is not to find a
  * kernel-wins crossover (there isn't one to find) but to bound the
  * price of preferring the ENGINE-NATIVE operator where its state is
  * comfortably bounded: at every rung at or below the budget the
  * native penalty stays mild and roughly flat (1.2–1.25×), at the
  * first rung above (955k) it is 1.7× and climbing superlinearly
  * from there (2.9× at 2.86M, 3.9× at 9.5M) — 500k caps the native
  * preference before the state-store merge-sort's superlinear regime
  * begins, which is the structural boundary the budget guards (not
  * an exact penalty line). Override per session with
  * `graft.session.nativeMaxSessions`; the sample modulus with
  * `graft.session.probeSampleMod` (default 16). Both branches are
  * spec-pinned row-equal (SessionDispatchSpec) — a wrong estimate
  * costs wall clock, never rows. */
object SessionDispatch {

  def maxNativeSessions(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.session.nativeMaxSessions")
      .map(_.toLong).getOrElse(500L * 1000L)

  def probeSampleMod(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.session.probeSampleMod")
      .map(_.toLong).getOrElse(16L)

  /** Estimated total session count over `events` (user_id, ts) at the
    * given gap, from the 1-in-`sampleMod` user slice. Exact when
    * sampleMod = 1 (it is then the batch session-count law itself);
    * an empty sample estimates 0 — at any scale where the estimate
    * could matter, 1/m of the user space is populated. */
  def estimatedSessions(events: DataFrame, gapMinutes: Int,
                        sampleMod: Long): Long = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("tus")
    val row = events
      .filter(pmod(col("user_id"), lit(sampleMod)) === 0)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .agg(sum(when(col("prev").isNull ||
        col("tus") - col("prev") > gapUs, 1L).otherwise(0L)))
      .head()
    if (row.isNullAt(0)) 0L else row.getLong(0) * sampleMod
  }

  /** The dispatch decision: native `session_window` iff the estimated
    * session count fits the native state budget. */
  def chooseNative(events: DataFrame, gapMinutes: Int): Boolean =
    estimatedSessions(events, gapMinutes, probeSampleMod(events)) <=
      maxNativeSessions(events)
}
