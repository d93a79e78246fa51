package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** Transactional KEEP-LATEST upsert into a live JDBC table — the
  * streaming side of the reference's deployment shape (its orchestrator
  * writes batched multi-row statements inside one transaction per
  * batch, connection.js/utils.js:161): each Spark partition opens one
  * connection, probes/updates/inserts in `batchSize`-batched prepared
  * statements, and COMMITS ONCE — a failure rolls the partition back
  * and the micro-batch retries, so the destination only ever exposes
  * complete partition writes.
  *
  * IDEMPOTENT by construction: a row replaces the stored row for its
  * key only when its (version, tieBreak) is newer OR EQUAL — replaying
  * a committed micro-batch after a crash re-writes identical values
  * (the pipeline is deterministic) and converges to the same table,
  * which is what lets a foreachBatch restart recover without a
  * transactional sink log. The KEYS must be the table's primary key.
  *
  * Scale/dialect notes: the per-key probe SELECT + batched
  * UPDATE/INSERT is the PORTABLE upsert (works on Derby, MySQL,
  * Postgres alike) and is sized for the streaming case — micro-batch
  * volumes into dimension-sized targets, the reference's metadata
  * tables. A MySQL-only deployment can halve the round trips with
  * `INSERT … ON DUPLICATE KEY UPDATE`; that swap lives entirely inside
  * this object, the operator surface doesn't change. */
object JdbcUpsert {

  /** Lexicographic (version, tie) comparison on the live JDBC values.
    * NULL sorts first (an incoming NULL version never beats a real
    * one), matching `upsertLatest`'s DESC-NULLS-LAST window order. */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: java.lang.Comparable[_], y) =>
      x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
    case (x, y) =>
      throw new IllegalArgumentException(
        s"version/tie values must be Comparable: ${x.getClass} vs ${y.getClass}")
  }

  /** NULL-safe bind: `setObject(i, null)` is dialect-fragile (Derby
    * rejects untyped nulls), so nulls go through `setNull` with the
    * statement's own declared parameter type — fetched once per
    * prepared statement, not per row. */
  private final class Binder(ps: java.sql.PreparedStatement) {
    private lazy val types: Array[Int] = {
      val md = ps.getParameterMetaData
      Array.tabulate(md.getParameterCount)(i => md.getParameterType(i + 1))
    }
    def set(i: Int, v: Any): Unit =
      if (v == null) ps.setNull(i, types(i - 1)) else ps.setObject(i, v)
  }

  /** Upserts `df` (one transaction per partition). Collapses the frame
    * to one row per key first — a micro-batch may carry several
    * versions of one key and per-row upserts of those would race
    * within the batch. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
             versionCol: String, tieBreak: String, batchSize: Int = 500,
             quoted: Boolean = false): Unit = {
    val latest = graft.merge.MergeOps.upsertLatest(df, keyCols, versionCol, tieBreak)
    val cols = latest.schema.fieldNames.toSeq
    require(keyCols.forall(cols.contains), s"key columns $keyCols not all in $cols")
    val nonKeys = cols.filterNot(keyCols.contains)
    val tbl = if (quoted) Tables.quoteIdent(url, table) else table
    def idn(c: String) = if (quoted) Tables.quoteIdent(url, c) else c
    val selectSql = s"SELECT ${idn(versionCol)}, ${idn(tieBreak)} FROM $tbl WHERE " +
      keyCols.map(k => s"${idn(k)} = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $tbl (${cols.map(idn).mkString(", ")}) VALUES " +
      s"(${cols.map(_ => "?").mkString(", ")})"
    val updateSql = s"UPDATE $tbl SET ${nonKeys.map(c => s"${idn(c)} = ?").mkString(", ")} " +
      s"WHERE ${keyCols.map(k => s"${idn(k)} = ?").mkString(" AND ")}"
    latest.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val sel = conn.prepareStatement(selectSql)
          val ins = conn.prepareStatement(insertSql)
          val upd = conn.prepareStatement(updateSql)
          val (selB, insB, updB) = (new Binder(sel), new Binder(ins), new Binder(upd))
          var pending = 0
          def flush(): Unit = { ins.executeBatch(); upd.executeBatch(); pending = 0 }
          rows.foreach { r =>
            keyCols.zipWithIndex.foreach { case (k, i) => selB.set(i + 1, r.getAs[Any](k)) }
            val rs = sel.executeQuery()
            val action =
              if (!rs.next()) 'i'
              else {
                val c = cmp(r.getAs[Any](versionCol), rs.getObject(1)) match {
                  case 0 => cmp(r.getAs[Any](tieBreak), rs.getObject(2))
                  case n => n
                }
                if (c >= 0) 'u' else 's' // newer-or-equal replaces; older skips
              }
            rs.close()
            action match {
              case 'i' =>
                cols.zipWithIndex.foreach { case (c, i) => insB.set(i + 1, r.getAs[Any](c)) }
                ins.addBatch(); pending += 1
              case 'u' =>
                nonKeys.zipWithIndex.foreach { case (c, i) => updB.set(i + 1, r.getAs[Any](c)) }
                keyCols.zipWithIndex.foreach { case (k, i) =>
                  updB.set(nonKeys.length + i + 1, r.getAs[Any](k))
                }
                upd.addBatch(); pending += 1
              case _ => ()
            }
            if (pending >= batchSize) flush()
          }
          flush()
          conn.commit()
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: java.sql.SQLException => () }
            throw e
        } finally conn.close()
      }
    }
  }
}
