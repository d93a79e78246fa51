package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the temporal operator Spark's built-ins lack (the
  * brief's canonical custom-operator example): for every left row,
  * the LATEST right row with the same key and right.time ≤ left.time.
  *
  * NOT implemented as a range join (O(n·m) candidate blowup, or an
  * interval-index build) but as the union+window shape that scales on
  * a cluster: tag both sides, union, ONE shuffle on the key, one
  * in-partition sort by (time, side, tie), then `last(right-payload,
  * ignoreNulls)` over unbounded-preceding..current carries the most
  * recent right payload forward into each left row. Cost = one
  * shuffle + one sort regardless of time-range density — the same
  * shape Flink's temporal join and kdb's aj compile to.
  *
  * Tie semantics (deterministic): a right row at EXACTLY left.time
  * matches (≤, the standard as-of contract); among right rows sharing
  * (key, time) the one with the greatest `rightTieBreak` wins.
  */
object AsOf {

  /** @param rightPayload right columns to carry (aliased as given);
    *                     left keeps ALL its columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    val payload = rightPayload.map(c => s"__asof_$c")
    // right rows first at equal times (side=0 < side=1), so ≤ holds;
    // later right rows at the same time overwrite earlier ones in the
    // running `last`, realizing the max-tieBreak winner
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
        col(rightTieBreak).as("__tie")) ++
        rightPayload.zip(payload).map { case (c, a) => col(c).as(a) }: _*)
    val leftCols = left.columns
    val taggedLeft = left.select(
      (leftCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(taggedRight.schema("__tie").dataType).as("__tie")) ++
        payload.map(a => lit(null).cast(taggedRight.schema(a).dataType).as(a)): _*)
    val unioned = taggedLeft.unionByName(
      taggedRight.select(taggedLeft.columns.map(c =>
        if (leftCols.contains(c) && !keys.contains(c)) lit(null).cast(taggedLeft.schema(c).dataType).as(c)
        else col(c)): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, a) =>
      df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop("__t", "__side", "__tie")
      .withColumnsRenamed(payload.zip(rightPayload).map { case (a, c) => a -> s"asof_$c" }.toMap)
  }
}
