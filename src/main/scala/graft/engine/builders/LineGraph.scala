package graft.engine.builders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1: monthly subscriber/customer counts (`update_linegraph.py:33-43`).
  *
  * Schema: year TEXT, month TEXT, subscriber_count INT, customer_count INT
  * (`table_list.py:13-18`). The reference appends the delta rows blindly
  * (INSERT INTO main SELECT * FROM temp — no upsert), so merge is a
  * plain union-append.
  */
object LineGraph {

  def build(imported: DataFrame): DataFrame =
    imported.groupBy("year", "month")
      .agg(
        count(when(col("user_type") === "subscriber", 1)).cast("int")
          .as("subscriber_count"),
        count(when(col("user_type") === "customer", 1)).cast("int")
          .as("customer_count"))

  def merge(existing: DataFrame, delta: DataFrame): DataFrame =
    existing.unionByName(delta)
}
