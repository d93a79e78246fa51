package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression conversion lives behind `private[sql]` in
  * Spark 4; this subpackage bridge exposes exactly the two calls the
  * graft custom expressions need (the standard pattern for Spark
  * extension libraries). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A faithful, stable SQL rendering of an UNRESOLVED Column, for
    * use in cache keys. `expression(c).sql` is NOT that: in Spark 4 a
    * Column wraps a ColumnNode and the lazy Expression wrapper
    * renders as the constant `columnnodeexpression()` — two different
    * predicates key IDENTICALLY and silently share one cache entry
    * (found when the walk entry-cell memo handed s35's unrestricted
    * cells to s40's live-only serving). The ColumnNode's own
    * normalized sql renders the real tree. */
  def sql(c: Column): String = c.node.normalized.sql
}
