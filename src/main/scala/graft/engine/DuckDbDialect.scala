package graft.engine

import java.sql.SQLException
import org.apache.spark.sql.jdbc.JdbcDialect

/** Spark JDBC dialect for embedded DuckDB (S8; reference opens its
  * `.db` warehouse at `citibike_data_process/main.py:45-55`).
  *
  * Why it's needed: Spark 4's `JdbcUtils.tableExists` asks the dialect
  * whether the probe's SQLException means "object not found". DuckDB's
  * JDBC driver reports catalog misses with a NULL SQLState, which the
  * default dialect doesn't recognize — so the very first write to a
  * fresh database dies on the existence probe instead of creating the
  * table. Everything else (TEXT/BIGINT/DOUBLE type mapping,
  * double-quoted identifiers) matches the default dialect.
  *
  * No DuckDB classes are referenced — the dialect keys off the URL and
  * message text, so the driver jar stays an optional runtime dependency.
  */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("Catalog Error") && m.contains("does not exist")
  }

  /** DuckDB's driver answers `isSigned = false` for BIGINT columns, so
    * Spark's default inference widens them to DECIMAL(20,0) as if they
    * were unsigned — pin plain BIGINT back to LongType (HUGEINT still
    * takes the default DECIMAL path, which is correct). */
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: org.apache.spark.sql.types.MetadataBuilder)
      : Option[org.apache.spark.sql.types.DataType] =
    (sqlType, typeName) match {
      case (java.sql.Types.BIGINT, "BIGINT") =>
        Some(org.apache.spark.sql.types.LongType)
      case _ => None
    }
}
