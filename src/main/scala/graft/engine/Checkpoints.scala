package graft.engine

import org.apache.spark.sql.DataFrame

/** Eager result pinning with a cluster-safe escape hatch.
  *
  * Several operators pin an intermediate result and truncate its
  * lineage (LSH dup edges, contamination reports, converged component
  * labels): the upstream plan is expensive, referenced more than once,
  * and — for the CC kernel — must not be re-planned per iteration.
  * Locally `localCheckpoint(eager = true)` is the right tool: blocks
  * stay in executor memory/disk, no filesystem round-trip.
  *
  * On a real cluster localCheckpoint is a liveness bet: the blocks die
  * with their executor and the TRUNCATED lineage cannot recompute them
  * — a lost executor mid-job fails the whole query. Setting
  * `graft.checkpoint.dir` (session conf) switches every pin to a
  * reliable checkpoint under that path (HDFS/object store), which
  * survives executor loss at the cost of one write+read. Leave it
  * unset on single-node runs; set it on any cluster where executor
  * churn is expected (spot instances, autoscaling, 1000-executor
  * 100 TB jobs).
  */
object Checkpoints {

  /** Session conf key: when set, [[pin]] checkpoints reliably under
    * this directory instead of into executor-local blocks. */
  val DirKey = "graft.checkpoint.dir"

  // SparkContext.setCheckpointDir mints a fresh UUID subdirectory on
  // every call — only (re)set it when the configured value changes,
  // or repeated pins would litter one subdir per call
  private var appliedDir: Option[String] = None

  /** Materialize `df` eagerly and truncate its lineage. Local blocks
    * by default; a reliable checkpoint when [[DirKey]] is set. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey) match {
      case Some(dir) =>
        synchronized {
          if (!appliedDir.contains(dir)) {
            spark.sparkContext.setCheckpointDir(dir)
            appliedDir = Some(dir)
          }
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
