package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S8: JDBC table mode round-trips (reference: the embedded DuckDB
  * warehouse file, `citibike_data_process/main.py:45-55`).
  *
  * Two embedded engines: DuckDB (the reference's database, test-scoped
  * jar from the offline cache) and Derby (ships with the Spark jars) —
  * proving the engine-side code is driver-agnostic.
  */
class JdbcStoreSpec extends SparkSpec {

  private def roundTrip(target: TableStore.JdbcTarget, table: String): Unit = {
    import spark.implicits._
    val df = Seq(
      ("2024", "Jan", 42L, 1.5),
      ("2024", "Feb", 7L, -0.25),
      ("2025", "Jan", 0L, 0.0)
    ).toDF("year", "month", "n", "v")
    TableStore.writeJdbc(df, target, table)
    val back = TableStore.readJdbc(spark, target, table)
    assert(back.count() === 3)
    assert(back.columns.sorted.toSeq === Seq("month", "n", "v", "year"))
    val jan24 = back.filter(col("year") === "2024" && col("month") === "Jan")
      .select("n", "v").collect()
    assert(jan24.map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((42L, 1.5)))
    // append mode adds without dropping
    TableStore.writeJdbc(df.limit(1), target, table, mode = "append")
    assert(TableStore.readJdbc(spark, target, table).count() === 4)
    // overwrite replaces
    TableStore.writeJdbc(df.filter(col("year") === "2025"), target, table)
    assert(TableStore.readJdbc(spark, target, table).count() === 1)
  }

  test("DuckDB JDBC round-trip: write, append, overwrite, read back") {
    val dir = tmpDir("jdbc-duckdb")
    roundTrip(TableStore.JdbcTarget(s"jdbc:duckdb:$dir/wh.db"), "LineGraphTable")
  }

  test("Derby JDBC round-trip: the same engine code, different driver") {
    val dir = tmpDir("jdbc-derby")
    // Derby's dialect maps StringType to CLOB, which Derby can't compare
    // against pushed-down string predicates — pin VARCHAR column types
    // (the createTableColumnTypes passthrough a real user would set)
    roundTrip(TableStore.JdbcTarget(
      s"jdbc:derby:$dir/wh;create=true",
      driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"),
      options = Map(
        "createTableColumnTypes" -> "year VARCHAR(32), month VARCHAR(32)")),
      "LineGraphTable")
  }
}
