package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Plan evidence for the round-17 τ-dispatched decontamination entry
  * ([[graft.ops.Similarity.contaminationKeep]]): prints the formatted
  * physical plan of the contamination keep-frame over the capstone's
  * stage-4 inputs (corpus = embeddings vec_id%10≠3, bench = the %10=3
  * eval slice) at the gated τ=0.9 (the near-dup regime → cell-pruned
  * candidates) and at τ=0.4 (below LshCrossoverSim → the exact
  * kernel). The committed dumps live in plans/r17/; the before-tree
  * twin (round 16, unconditional cell path at BOTH τ) is the same
  * file with the `contaminationKeep` call swapped for
  * `embeddingContaminationCells`, run from the 91f7945 worktree.
  *
  * Usage: ProbeDecontamPlan [sfDir] */
object ProbeDecontamPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.engine.Tables(spark, dir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 3)
    val bench = emb.filter(col("vec_id") % 10 === 3)
    Seq(900000L, 400000L).foreach { tau =>
      println(s"##### contaminationKeep plan at tauX1e6=$tau")
      val frame = graft.ops.Similarity.contaminationKeep(corpus, bench, tau)
      println(frame.queryExecution.explainString(FormattedMode).take(8000))
    }
    spark.stop()
  }
}
