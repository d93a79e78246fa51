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
}
