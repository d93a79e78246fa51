package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types._

/** Spark JDBC dialect for DuckDB — Spark ships none, and the default
  * dialect mis-types DuckDB scans: DuckDB's JDBC driver (1.0.x) reports
  * `isSigned = false` for EVERY column, which routes signed integer
  * columns through Spark's unsigned-integer branches (BIGINT →
  * DecimalType(20,0), INTEGER → LongType), silently widening the whole
  * schema. Registering the engine's real (all-signed) integer mapping
  * restores type fidelity, which the merge layer's oracle-hash parity
  * depends on (JdbcMergeSpec's second-dialect E2E).
  *
  * Registration is process-global and idempotent-by-guard: every graft
  * JDBC surface ([[Tables]]) calls [[ensureRegistered]] before touching
  * a URL. On a cluster, dialect resolution happens where plans are
  * built (the driver), so a driver-side registration suffices; local
  * mode shares the JVM anyway.
  *
  * The reference tool targets one hard-coded engine (connection.js:1);
  * dialect pluggability is what makes the same merge config portable.
  *
  * OPERATIONAL CAVEAT (duckdb_jdbc 1.0.x, embedded files): the driver
  * shares the in-process database instance only while at least one
  * connection is open; full open/close churn makes the evict/boot
  * cycle race concurrent Spark tasks, and connections land on stale
  * instances (scans of just-written tables return "table does not
  * exist" or 0 rows). Hold ONE pinned connection per database file
  * from before the first Spark access until the last — measured
  * 0/30 vs up-to-10/10 failures in JdbcMergeSpec's probe. Server
  * engines (MySQL/Postgres) have no such lifecycle to race. */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] =
    (sqlType, typeName.toUpperCase(java.util.Locale.ROOT)) match {
      // signed integers, despite the driver's blanket isSigned=false
      case (Types.BIGINT, "BIGINT")     => Some(LongType)
      case (Types.INTEGER, "INTEGER")   => Some(IntegerType)
      case (Types.SMALLINT, "SMALLINT") => Some(ShortType)
      case (Types.TINYINT, "TINYINT")   => Some(ByteType)
      // DuckDB-specific unsigned/huge types surface as Types.OTHER
      // (2000); map the ones with an exact Spark shape
      case (_, "UBIGINT")  => Some(DecimalType(20, 0))
      case (_, "UINTEGER") => Some(LongType)
      case (_, "USMALLINT") => Some(IntegerType)
      case (_, "UTINYINT") => Some(ShortType)
      case (_, "HUGEINT")  => Some(DecimalType(38, 0))
      case _ => None // everything else: Spark's default mapping is right
    }

  @volatile private var registered = false
  /** Idempotent global registration; cheap enough to call per JDBC
    * entry point. */
  def ensureRegistered(): Unit =
    if (!registered) synchronized {
      if (!registered) { JdbcDialects.registerDialect(this); registered = true }
    }
}
