package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions.pmod
import org.apache.spark.sql.graftbridge.Bridge

/** Exact integer column arithmetic shared by every ×1e6-ratio emitter
  * (TextAnalysis, Dedup d10, Knn s3/s6 audits). ONE implementation:
  * the round-half-up division convention and its precision contract
  * live here, so a fix cannot silently diverge between operators. */
object IntMath {

  /** Round-half-up integer division, exact at ANY magnitude.
    *
    * floor((2n + d) / 2d) = round-half-up(n / d); pmod keeps floor
    * semantics for negative numerators (s3's centroid sums). The
    * quotient is taken with Catalyst's `IntegralDivide` (long ÷ long)
    * — NOT `/`, whose double path rounds numerators past 2⁵³: at the
    * 100 TB design point a per-cluster ×1e6 sum exceeds that long
    * before it exceeds Long.MaxValue, and a rounded numerator would
    * drift the result away from the DuckDB oracle's exact `//` by
    * several units. The numerator here is an exact multiple of the
    * divisor, so the integral quotient is the exact ratio. */
  def halfUpDiv(num: Column, den: Column): Column = {
    val n2 = num.cast("long") * 2 + den.cast("long")
    val d2 = den.cast("long") * 2
    Bridge.column(IntegralDivide(
      Bridge.expression(n2 - pmod(n2, d2)), Bridge.expression(d2)))
  }

  /** Per-group DISCRETE MEDIAN over a value HISTOGRAM — the exact
    * percentile_disc(0.5) every robust-dispersion operator (q32 MAD,
    * t29 length fences) runs: ceil(n/2)-rank over the cumulative
    * histogram, so the window's partition row count is bounded by
    * DISTINCT values, never group size. ONE implementation so a
    * rank-formula change cannot silently diverge between operators.
    *
    * @param h       (groupCol, valCol, cnt) histogram frame
    * @param groupCol grouping column name
    * @param valCol   value column name
    * @return (groupCol, n, med) — group total and disc-median value
    */
  def discMedianHist(h: org.apache.spark.sql.DataFrame,
                     groupCol: String, valCol: String)
  : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, expr, max, min, sum, when}
    val cum = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col(groupCol))
    h.withColumn("cum", sum(col("cnt")).over(cum))
      .withColumn("n", sum(col("cnt")).over(tot))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col(valCol))).as("med"))
  }
}
