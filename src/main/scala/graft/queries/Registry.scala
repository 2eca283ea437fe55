package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered capability query.
  *
  * @param name   stable key, used by the driver's Verify/Bench harness
  * @param ops    SURVEY.md §2 operator ids (or pipeline-op family) covered
  * @param oracle equivalent DuckDB SQL over the same tables; None for
  *               non-SQL-expressible ops (driver falls back to a
  *               rows-only check)
  */
final case class Q(name: String, ops: String, oracle: Option[String],
                   fn: (SparkSession, String) => DataFrame)

object Registry {
  lazy val all: Seq[Q] = Parity.queries ++ Pipeline.queries

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
