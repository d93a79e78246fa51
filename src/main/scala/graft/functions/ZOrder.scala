package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: interleave the bits of two non-negative
  * dimensions so that points close in BOTH dimensions are close on the
  * curve. Sorting/range-partitioning data by `zvalue` is the classic
  * multi-dimensional clustering layout (Orenstein & Merrett, "A class
  * of data structures for associative searching", PODS 1984; the
  * technique behind modern lakehouse OPTIMIZE ZORDER BY): parquet
  * min/max row-group stats then prune box queries on EITHER dimension
  * ~√-effectively, where a 1-D sort gives pruning on one dimension
  * and none on the other. See [[graft.sources.Layout.zorderWrite]]
  * for the writer and SourcesSpec for the measured pruning contrast.
  *
  * The interleave is the O(log bits) "binary magic numbers" spread —
  * five shift-or-mask steps per dimension, all built-in long ops, so
  * the whole zvalue stays inside whole-stage codegen (no UDF, no
  * custom Expression needed). Inputs are masked to 31 bits; the
  * result occupies ≤62 bits and is always non-negative, so long
  * ordering == curve ordering. [[zvalueSql]] emits the identical
  * arithmetic as DuckDB SQL for cross-engine oracles.
  */
object ZOrder {

  /** (shift, mask) steps spreading a 31-bit value onto even bit
    * positions: after step k each bit group is split in half and the
    * gaps zeroed — the standard part1by1 chain, widest group first. */
  private val steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 31 bits of `c` onto even bit positions 0,2,…,60. */
  def spread(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton code of (x, y): x's bits at even positions, y's at odd. */
  def zvalue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** The same spread as a SQL string (DuckDB `& | <<` semantics match
    * Spark's on BIGINT; masks spelled in decimal). The input expression
    * is duplicated 2^steps times — keep `e` a simple column/arith
    * expression, not a subquery. */
  def spreadSql(e: String): String =
    steps.foldLeft(s"(($e) & 2147483647)") {
      case (x, (s, m)) => s"((($x | ($x << $s))) & $m)"
    }

  /** SQL twin of [[zvalue]]. */
  def zvalueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}
