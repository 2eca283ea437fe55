package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pin contract: identical results either way; local blocks by
  * default, files under graft.checkpoint.dir when set (the cluster
  * posture — localCheckpoint blocks die with their executor and the
  * truncated lineage cannot recompute them). */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("pin defaults to localCheckpoint (no checkpoint files) and " +
    "switches to reliable files under graft.checkpoint.dir") {
    val df = (1L to 100L).toDF("id").withColumn("sq", col("id") * col("id"))

    // default: no conf -> local blocks, nothing written anywhere
    val local = Checkpoints.pin(df)
    assert(local.count() == 100)
    assert(local.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))

    val dir = new java.io.File(tmpDir("reliable-ckpt")).getAbsolutePath
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val reliable = Checkpoints.pin(df)
      assert(reliable.count() == 100)
      assert(reliable.as[(Long, Long)].collect().toSet ==
        local.as[(Long, Long)].collect().toSet)
      // the pinned result is backed by files under the configured dir
      def filesUnder(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(filesUnder) else Seq(f)
      assert(filesUnder(new java.io.File(dir)).nonEmpty,
        s"no checkpoint files under $dir")
      // operators built on pin keep working with the conf set: the CC
      // kernel pins its edge list and its converged labels
      val labels = graft.ops.Dedup.componentLabels(
        Seq(1L, 2L, 3L, 4L).toDF("id"),
        Seq((1L, 2L), (2L, 3L)).toDF("a", "b"))
      val roots = labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(roots == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
    } finally spark.conf.unset(Checkpoints.DirKey)
  }
}
