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
  * Scale/dialect notes: the batched probe SELECT (one OR-chain query
  * per `batchSize` chunk, building an in-memory key→(version,tie)
  * map) + batched UPDATE/INSERT is the PORTABLE upsert (works on
  * Derby, MySQL, Postgres alike — row-value IN lists would not) and
  * costs ~2 round trips per chunk instead of one per row. Sized for
  * the streaming case — micro-batch volumes into dimension-sized
  * targets, the reference's metadata tables. A MySQL-only deployment
  * can halve the remaining round trips with `INSERT … ON DUPLICATE
  * KEY UPDATE`; that swap lives entirely inside this object, the
  * operator surface doesn't change. */
object JdbcUpsert {

  /** Normalize a JDBC/Spark value to a common comparable form before
    * comparing or map-keying: drivers box numerics differently than
    * Spark (an INTEGER column probed back as Integer vs a Spark Long
    * version would throw in compareTo), so numbers ride BigDecimal and
    * temporal types ride Instant (nanos preserved). Scale is stripped
    * so BigDecimal EQUALS (map keys) agrees with compareTo. */
  private def norm(v: Any): Any = v match {
    case null                  => null
    case n: java.lang.Number   => new java.math.BigDecimal(n.toString).stripTrailingZeros()
    case t: java.sql.Timestamp => t.toInstant
    case d: java.sql.Date      => java.time.Instant.ofEpochMilli(d.getTime)
    case other                 => other
  }

  /** Lexicographic (version, tie) comparison on the live JDBC values,
    * after [[norm]]. NULL sorts first (an incoming NULL version never
    * beats a real one), matching `upsertLatest`'s DESC-NULLS-LAST
    * window order. */
  private def cmp(a0: Any, b0: Any): Int = (norm(a0), norm(b0)) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: java.lang.Comparable[_], y)
        if x.getClass.isInstance(y) || y.getClass.isInstance(x) =>
      x.asInstanceOf[java.lang.Comparable[Any]].compareTo(y)
    case (x, y) =>
      throw new IllegalArgumentException(
        s"version/tie values not comparable after normalization: ${x.getClass} vs ${y.getClass}")
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
    val insertSql = s"INSERT INTO $tbl (${cols.map(idn).mkString(", ")}) VALUES " +
      s"(${cols.map(_ => "?").mkString(", ")})"
    val updateSql = s"UPDATE $tbl SET ${nonKeys.map(c => s"${idn(c)} = ?").mkString(", ")} " +
      s"WHERE ${keyCols.map(k => s"${idn(k)} = ?").mkString(" AND ")}"
    // batched probe: ONE round trip per batchSize chunk (an OR-chain of
    // per-key equality conjunctions — row-value IN lists are not
    // portable to Derby), not one per row; writes were already batched,
    // so the whole partition costs ~2 round trips per chunk + 1 commit
    def probeSql(n: Int): String =
      s"SELECT ${(keyCols ++ Seq(versionCol, tieBreak)).map(idn).mkString(", ")} FROM $tbl WHERE " +
        Seq.fill(n)(keyCols.map(k => s"${idn(k)} = ?").mkString("(", " AND ", ")"))
          .mkString(" OR ")
    latest.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ins = conn.prepareStatement(insertSql)
          val upd = conn.prepareStatement(updateSql)
          val (insB, updB) = (new Binder(ins), new Binder(upd))
          // full-size probe statement reused across chunks; a short
          // final chunk prepares its own once
          var probeFull: java.sql.PreparedStatement = null
          rows.grouped(batchSize).foreach { chunk =>
            val sel =
              if (chunk.length == batchSize) {
                if (probeFull == null) probeFull = conn.prepareStatement(probeSql(batchSize))
                probeFull
              } else conn.prepareStatement(probeSql(chunk.length))
            val selB = new Binder(sel)
            chunk.iterator.zipWithIndex.foreach { case (r, ri) =>
              keyCols.zipWithIndex.foreach { case (k, i) =>
                selB.set(ri * keyCols.length + i + 1, r.getAs[Any](k))
              }
            }
            // key (normalized) → stored (version, tie)
            val existing = scala.collection.mutable.HashMap.empty[Seq[Any], (Any, Any)]
            val rs = sel.executeQuery()
            while (rs.next()) {
              val key = keyCols.indices.map(i => norm(rs.getObject(i + 1)))
              existing(key) = (rs.getObject(keyCols.length + 1), rs.getObject(keyCols.length + 2))
            }
            rs.close()
            if (sel ne probeFull) sel.close()
            chunk.foreach { r =>
              existing.get(keyCols.map(k => norm(r.getAs[Any](k)))) match {
                case None =>
                  cols.zipWithIndex.foreach { case (c, i) => insB.set(i + 1, r.getAs[Any](c)) }
                  ins.addBatch()
                case Some((v, t)) =>
                  val c = cmp(r.getAs[Any](versionCol), v) match {
                    case 0 => cmp(r.getAs[Any](tieBreak), t)
                    case n => n
                  }
                  if (c >= 0) { // newer-or-equal replaces; older skips
                    nonKeys.zipWithIndex.foreach { case (cn, i) => updB.set(i + 1, r.getAs[Any](cn)) }
                    keyCols.zipWithIndex.foreach { case (k, i) =>
                      updB.set(nonKeys.length + i + 1, r.getAs[Any](k))
                    }
                    upd.addBatch()
                  }
              }
            }
            ins.executeBatch(); upd.executeBatch()
          }
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
