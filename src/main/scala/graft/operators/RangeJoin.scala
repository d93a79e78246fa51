package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — the second temporal operator
  * Spark's planner handles badly: `points JOIN intervals ON t BETWEEN
  * lo AND hi` with no equi-key compiles to BroadcastNestedLoopJoin —
  * every point × every interval, a scale-killer.
  *
  * The fix is BINNING (the standard interval-join technique, used by
  * e.g. Databricks' range-join hints and genomics engines): choose a
  * bin width, explode each interval into the bins it covers, bin each
  * point, and equi-join on the bin — the range predicate survives only
  * as a post-join filter. Shuffle volume ∝ points + interval·span/bin,
  * never |points|·|intervals|. The bin width trades replication of
  * long intervals against bucket selectivity; pass the expected
  * interval length.
  *
  * Deduplication is structural: a (point, interval) pair meets in
  * EXACTLY one bin — the point's own bin — so no distinct pass is
  * needed (the interval is exploded to every covered bin, the point
  * sits in one of them).
  */
object RangeJoin {

  /** @param points     DataFrame with a long point column `t`
    * @param intervals  DataFrame with long `lo`/`hi` columns
    *                   (inclusive bounds)
    * @param binWidth   bin size in the same units as t/lo/hi
    * @return each point row joined to every interval containing it;
    *         all columns of both inputs survive. Inner semantics:
    *         points in no interval are dropped. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                t: String, lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedPoints = points.withColumn("__bin", floor(col(t) / binWidth))
    // inverted intervals (lo > hi) contain no points — drop them BEFORE
    // sequence(), which would otherwise step DOWNWARD through every bin
    // between the bounds (huge arrays / sequence-length errors for far
    // bounds) instead of yielding zero rows
    val binnedIntervals = intervals.filter(col(lo) <= col(hi)).withColumn("__bin",
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__bin")
  }
}
