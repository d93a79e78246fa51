package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Plan-audit tool: print the physical plan of registered queries.
  * `runMain graft.Explain [query ...]` (default: all). Set
  * SPARK_GRAFT_SF_DIR to pick the scale. The per-operator scale notes
  * in SURVEY §2 are kept honest against these plans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.maxPlanStringLength", 1000000)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n======== $n ========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(SimpleMode))
    }
    spark.stop()
  }
}
