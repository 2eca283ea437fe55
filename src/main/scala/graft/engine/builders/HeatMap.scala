package graft.engine.builders

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Merge

/** A2 + P8: trips per (year, month, hour) with additive upsert
  * (`update_heatmap.py:8-63`).
  *
  * Schema: year TEXT, month TEXT, hour INT, total_count INT
  * (`table_list.py:25-30`). The reference's two-statement upsert
  * (UPDATE add + anti-join INSERT) is the single full-outer-join merge.
  */
object HeatMap {

  def build(imported: DataFrame): DataFrame =
    imported
      .withColumn("hour", date_format(col("start_time"), "HH").cast("int"))
      .groupBy("year", "month", "hour")
      .agg(count(lit(1)).cast("int").as("total_count"))

  def merge(existing: DataFrame, delta: DataFrame): DataFrame =
    Merge.upsertAdd(existing, delta, Seq("year", "month", "hour"),
        Seq("total_count"))
      .withColumn("total_count", col("total_count").cast("int"))
}
