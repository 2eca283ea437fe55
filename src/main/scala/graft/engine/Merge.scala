package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic upsert over immutable storage.
  *
  * The reference mutates tables in place with an UPDATE half and an
  * INSERT half (`update_heatmap.py:17-35`, `update_tripsmap.py:37-56`,
  * `update_dockmap.py:253-284`). Parquet is immutable, so the idiomatic
  * Spark rewrite is one full-outer join on the upsert keys producing the
  * merged table in a single shuffle; the caller writes it back with an
  * atomic temp-and-swap (see [[TableStore]]).
  *
  * Scale notes: one shuffle on the key columns, no driver round-trip.
  * When `existing` is a small state table (manifest, dock state) callers
  * should broadcast it; for 100 TB fact-side merges both sides shuffle
  * on the same keys, so AQE coalesces/splits partitions as needed.
  */
object Merge {

  /** Additive merge: rows matched on `keys` add their `addCols`
    * (the reference's `SET n = main.n + temp.n`); unmatched rows carry
    * their own value (INSERT half). */
  def upsertAdd(existing: DataFrame, delta: DataFrame,
                keys: Seq[String], addCols: Seq[String]): DataFrame = {
    val e = addCols.foldLeft(existing)((d, c) => d.withColumnRenamed(c, s"__e_$c"))
    val d = addCols.foldLeft(delta)((x, c) => x.withColumnRenamed(c, s"__d_$c"))
    e.join(d, keys, "full_outer")
      .select(keys.map(col) ++ addCols.map(c =>
        (coalesce(col(s"__e_$c"), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L))).as(c)): _*)
  }

  /** Replacing merge: delta wins on matched keys, existing rows without
    * a delta survive (the reference's correlated-subquery UPDATE J6 +
    * NOT IN insert J5, `update_dockmap.py:253-284`). */
  def upsertReplace(existing: DataFrame, delta: DataFrame,
                    keys: Seq[String], payload: Seq[String]): DataFrame = {
    val e = payload.foldLeft(existing)((d, c) => d.withColumnRenamed(c, s"__e_$c"))
    val d = payload.foldLeft(delta)((x, c) => x.withColumnRenamed(c, s"__d_$c"))
    e.join(d, keys, "full_outer")
      .select(keys.map(col) ++ payload.map(c =>
        coalesce(col(s"__d_$c"), col(s"__e_$c")).as(c)): _*)
  }
}
