package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cumulative sums over value histograms.
  *
  * The q25 histogram-first convention collapses a fact table to a
  * `(value → count)` histogram before any rank/quantile window — sound
  * when the histogram is value-DOMAIN-bounded (prices in cents, days,
  * small counts). It breaks when the value is itself a per-entity SUM
  * (customer revenue): at scale nearly every entity has a distinct
  * total, the "histogram" is entity-cardinality, and an unpartitioned
  * `Window.orderBy(value)` serializes it through ONE task.
  *
  * [[blockCum]] is the scale-safe form: the two-level exclusive prefix
  * sum `t12_pack` uses for corpus token offsets, generalized to any
  * ordered histogram. Level 1 block-partitions the VALUE axis
  * (arithmetic shift, so blocks tile the value order for both signs);
  * each block computes its local inclusive running sum in parallel.
  * Level 2 runs the only unpartitioned window over the per-block
  * TOTALS — #blocks ≈ value-range / 2^blockShift rows, bounded by the
  * value DOMAIN (per-entity sums grow with entity activity, not row
  * count), never by entity cardinality — and broadcasts each block's
  * exclusive offset back. `cum = block_offset + local_running_sum` is
  * bit-identical to the single-window result because blocks tile the
  * global order.
  */
object PrefixSum {

  /** Append inclusive cumulative sum `cumName` of `cnt` over `df`
    * ordered by column `v` (globally, ascending or descending),
    * without ever moving the frame through a single partition.
    *
    * Requires `v` integral and distinct per row (a histogram key —
    * both q33/q36 call sites group by it first); ties would make the
    * running sum nondeterministic exactly as they would under the
    * single global window this replaces.
    *
    * The input is consumed TWICE (local sums + block totals) — pass a
    * memoized/cached histogram ([[Indexes.memo]]) or the lazy lineage
    * re-derives the upstream aggregation per consumer.
    *
    * `blockShift` trades block count against block width: 2^22 ≈ 4.2M
    * value units per block keeps monetary-cents domains in the
    * hundreds of blocks; domain-bounded axes (days, per-customer
    * order counts) collapse to one block, which is the small case the
    * global window was already fine for — still partitioned, so the
    * plan gate sees no unpartitioned data-sized window either way. */
  /** The histogram-first DOMAIN CONTRACT, and its escape hatch.
    *
    * Every histogram-first operator (q25/q30/q31/q32's convention:
    * collapse the fact table to a `(group, value) → count` histogram,
    * then rank/quantile over the histogram) is sound ONLY while the
    * histogram is value-DOMAIN-bounded — discrete quantities, prices
    * in cents, day counts. A high-cardinality value column (raw
    * doubles, per-entity sums, micro-timestamps) silently degrades
    * the "histogram" back to fact-cardinality: the first aggregation
    * buys nothing and the ordered pass inherits the full data size.
    *
    * `quantize` is the documented knob for that case: floor the value
    * to multiples of `quantum` BEFORE the histogram groupBy, bounding
    * the histogram at domain/quantum rows per group. percentile_disc
    * over the quantized histogram returns the true percentile's
    * bucket floor — within `quantum` below-or-equal the exact answer
    * (the standard accuracy/size trade every t-digest/bucketed
    * quantile makes, here with a deterministic, oracle-reproducible
    * rule). Negative-safe: `v − pmod(v, quantum)` floors toward −∞ on
    * both engines, unlike a truncating DIV. */
  def quantize(value: Column, quantum: Long): Column = {
    require(quantum >= 1, s"quantum must be >= 1, got $quantum")
    if (quantum == 1L) value
    else value - pmod(value, lit(quantum))
  }

  def blockCum(df: DataFrame, v: String, cnt: String, cumName: String,
               descending: Boolean = false, blockShift: Int = 22): DataFrame = {
    require(blockShift > 0 && blockShift < 63, s"blockShift out of range: $blockShift")
    val ord: Column => Column = if (descending) _.desc else _.asc
    val blk = shiftright(col(v).cast("long"), blockShift)
    val withBlk = df.withColumn("__blk", blk)
    val perBlock = Window.partitionBy(col("__blk")).orderBy(ord(col(v)))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = withBlk.withColumn("__local", sum(col(cnt)).over(perBlock))
    // per-block totals → exclusive running offsets: the ONLY
    // unpartitioned window, over #blocks aggregate rows. This line is
    // what Spark's "No Partition Defined for Window" WARN points at in
    // bench logs — it is the deliberate two-level-prefix-sum design
    // (single-partition work bounded at domain/2^blockShift rows,
    // gate-pinned in PropertySpec), not an accident; the graft
    // entrypoints drop WindowExec's logger to ERROR for this reason.
    val offsets = withBlk.groupBy(col("__blk")).agg(sum(col(cnt)).as("__btot"))
      .withColumn("__boff", coalesce(sum(col("__btot")).over(
        Window.orderBy(ord(col("__blk"))).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__blk"), col("__boff"))
    local.join(broadcast(offsets), Seq("__blk"))
      .withColumn(cumName, col("__boff") + col("__local"))
      .drop("__blk", "__local", "__boff")
  }
}
