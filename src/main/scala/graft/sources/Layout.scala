package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Physical data layout for scan pruning — the write-side half of the
  * 100 TB story. Parquet row-group min/max stats prune for free, but
  * only if the layout actually clusters the queried dimensions:
  * a 1-D sort clusters one column and randomizes the rest, while a
  * z-order layout gives every clustered dimension ~√ pruning on box
  * queries. Complements [[Tables.writeBucketed]] (join locality) —
  * this is SCAN locality.
  */
object Layout {

  /** Write `df` clustered by the z-order curve over (cx, cy):
    * range-partition on the Morton code into `nFiles` files, sort
    * within each, drop the helper column. Each output file then covers
    * a compact z-range ≈ a quadtree tile — its (cx, cy) bounding box
    * is tight on BOTH dimensions, so parquet min/max stats skip it for
    * any box query that misses the tile. One shuffle, same cost shape
    * as the 1-D sorted write it replaces; at cluster scale the range
    * exchange is exactly how a sorted parquet compaction already runs.
    *
    * Dimensions are masked to 31 bits (see [[ZOrder]]); rows keep
    * their full values — only the ordering key is derived.
    */
  def zorderWrite(df: DataFrame, cx: String, cy: String, path: String,
                  nFiles: Int): Unit =
    df.withColumn("__z", ZOrder.zvalue(col(cx), col(cy)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
