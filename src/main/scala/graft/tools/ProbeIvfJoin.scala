package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.IvfIndex

/** Scale probe for the broadcast-join IVF assignment path
  * (IvfIndex.assignViaJoin): per scale dir, times the q74-shaped pair
  * detection under (a) the literal fused kernel with the
  * driver-collected sample quantizer — the registered bench path —
  * and (b) the join path with the hash-gated DataFrame quantizer at
  * the same cell target, plus (c) the join path at a deliberately
  * LARGE k (small cell target) past what the dispatcher would ever
  * hand to the literal kernel. (a) vs (b) prices the join machinery's
  * overhead at equal work; (c) shows the path the 100-TB sizing law
  * actually needs (k ~ n/cellSize with no driver ceiling) staying
  * sublinear. PROBE_SIM overrides the 0.7 threshold; PROBE_CELL /
  * PROBE_CELL_BIG override the cell targets (64 / 8). */
object ProbeIvfJoin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.engine.Tables(spark, dir, "embeddings")
    val n = e.count()
    val sim = sys.env.getOrElse("PROBE_SIM", "0.7").toDouble
    val cell = sys.env.getOrElse("PROBE_CELL", "64").toInt
    val cellBig = sys.env.getOrElse("PROBE_CELL_BIG", "8").toInt
    println(s"vectors=$n sim=$sim")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: pairs=$rows%d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time(s"literal cell=$cell")(
      IvfIndex.nearDupPairs(e, sim,
        IvfIndex.sampleCentroids(e, cell), nProbe = 2).count())
    // kEstimate = n/cell: the production form — the quantizer scan
    // happens once, inside the broadcast build, never in a count()
    time(s"join cell=$cell")(
      IvfIndex.nearDupPairsViaJoin(e, sim,
        IvfIndex.sampleCentroidsDf(e, cell), nProbe = 2,
        kEstimate = Some(math.max(1L, n / cell))).count())
    time(s"join cell=$cellBig (large k)")(
      IvfIndex.nearDupPairsViaJoin(e, sim,
        IvfIndex.sampleCentroidsDf(e, cellBig), nProbe = 2,
        kEstimate = Some(math.max(1L, n / cellBig))).count())
    spark.stop()
  }
}
