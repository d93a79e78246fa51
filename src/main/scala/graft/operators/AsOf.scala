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
  * in-partition sort by (time, side, tie), then `last(payload,
  * ignoreNulls)` carries the most recent right payload forward into
  * each left row. Cost = one shuffle + one sort regardless of
  * time-range density — the same shape Flink's temporal join and
  * kdb's aj compile to. Skew note: one key's full history sorts in
  * one task; as-of ordering is inherently per-key sequential, so
  * bound per-key volume upstream (e.g. time-bucket the key) if a key
  * is hot.
  *
  * The right payload is carried as ONE struct, not per-column: with
  * independent `last(c, ignoreNulls)` columns, a null field in the
  * latest right row would backfill from an OLDER row — a mixed match
  * no single right row produced. A struct is null/non-null atomically,
  * so the match is always exactly one right row (nullable fields and
  * all).
  *
  * Tie semantics (deterministic): a right row at EXACTLY left.time
  * matches (≤, the standard as-of contract); among right rows sharing
  * (key, time) the one with the greatest `rightTieBreak` wins.
  */
object AsOf {

  /** @param rightPayload right columns to carry (exposed as
    *                     `asof_<name>`); left keeps ALL its columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], rightTieBreak: String): DataFrame = {
    val payloadStruct = struct(rightPayload.map(col): _*)
    // join-equality semantics for NULL keys: a null-keyed right row
    // matches nothing (the window would otherwise group null keys
    // together and "match" them); null-keyed LEFT rows survive with a
    // null payload, like any unmatched left row
    val taggedRight = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
          col(rightTieBreak).as("__tie") :+ payloadStruct.as("__asof"): _*)
    val leftCols = left.columns
    val taggedLeft = left.select(
      (leftCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(taggedRight.schema("__tie").dataType).as("__tie") :+
        lit(null).cast(taggedRight.schema("__asof").dataType).as("__asof")).toIndexedSeq: _*)
    val unioned = taggedLeft.unionByName(
      taggedRight.select(taggedLeft.columns.toIndexedSeq.map(c =>
        if (leftCols.contains(c) && !keys.contains(c))
          lit(null).cast(taggedLeft.schema(c).dataType).as(c)
        else col(c)): _*))
    // right rows first at equal times (side 0 < 1) realizes ≤; later
    // right rows at the same (key, time) overwrite earlier ones in the
    // running last(), realizing the max-tieBreak winner
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    rightPayload.foldLeft(
        carried.filter(col("__side") === 1).drop("__t", "__side", "__tie")) {
      (df, c) => df.withColumn(s"asof_$c", col("__asof").getField(c))
    }.drop("__asof")
  }
}
