package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = graft.engine.Tables(spark, dir, "documents")
    val sigs = graft.ops.Dedup.simhash(docs)
    time("stage1: sigs count")(sigs.count())
    val cached = sigs.cache(); cached.count()
    val blocks = (0 until 4).map { k =>
      struct(lit(k).as("blk_idx"),
        shiftright(col("simhash"), 8 * k).bitwiseAND(lit(255L)).as("blk_val"))
    }
    val exploded = cached.select(col("doc_id"), col("simhash"),
        explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.blk_idx").as("blk_idx"), col("b.blk_val").as("blk_val"))
    time("stage2: exploded count")(exploded.count())
    val joined = exploded.as("a").join(exploded.as("b"),
        col("a.blk_idx") === col("b.blk_idx") &&
          col("a.blk_val") === col("b.blk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
    time("stage3: join count")(println("  pairs: " + joined.count()))
    time("stage4: distinct+filter")(joined.distinct().filter(col("hamming") <= 3).count())
    time("full q24 (warm lineage)")(graft.queries.Registry.queries("q24_dedup_simhash")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
