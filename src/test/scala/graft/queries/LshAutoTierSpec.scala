package graft.queries

import java.sql.DriverManager

import graft.SparkSpec
import graft.engine.Tables
import graft.ops.Similarity
import org.apache.spark.sql.functions.col

/** q76's oracle carries two band arms gated by the SQL-derived tier,
  * but every shipped sf dir lands on the 16-bit tier (n = 500 + 50
  * plants), so the driver's verify never exercises the 8-bit arm.
  * This spec replays the SAME registered oracle string in embedded
  * DuckDB over a 200-vector view (150 organic + 50 plants → 8-bit
  * tier) and checks pair-set equality against the Spark auto path on
  * the same subset — the cross-engine evidence the driver's gate
  * can't produce at the shipped corpus sizes. */
class LshAutoTierSpec extends SparkSpec {

  test("q76 oracle's 8-bit tier arm matches the Spark auto path cross-engine") {
    val sql = Registry.oracleSql("q76_lsh_auto_pairs")
    val con = DriverManager.getConnection("jdbc:duckdb:")
    try {
      con.createStatement().execute(
        "CREATE VIEW embeddings AS SELECT * FROM " +
          "'/root/testdata/sf0.01/embeddings.parquet' WHERE vec_id < 150")
      val rs = con.createStatement().executeQuery(sql)
      val fromDuck = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong("vec_a"), r.getLong("vec_b"),
          r.getLong("sim_x1e6")))
        .toSet
      val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
        .filter(col("vec_id") < 150)
      val planted = Similarity.plantNearDups(emb, 50)
      assert(Similarity.lshBitsForCorpus(planted.count()) == 8)
      val fromSpark = Similarity.nearDupPairsLshAuto(planted, 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fromDuck == fromSpark)
      assert(fromSpark.size == 50, s"got ${fromSpark.size} pairs")
    } finally con.close()
  }
}
