package graft

/** Ad-hoc plan dump for the round's new operators (test-scope main,
  * not a suite): prints the formatted physical plan so the 100 TB
  * shape can be eyeballed — broadcast sides, exchange count, pushdown.
  * Usage: Test/runMain graft.PlanAudit <query names...> */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d17_containment", "t34_bm25", "m29_cdc_apply", "s29_nn_descent")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, TestSpark.sf)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(8000))
    }
    spark.stop()
  }
}
