package graft

import org.apache.spark.sql.SparkSession

/** Depth-cost audit for the BPE trainer/encoder at realistic vocab
  * depth (32 merge rounds; the registered default of 5 is a demo).
  * Prints the per-round training cost curve, checks the 32-deep
  * chained-replace encoder plan compiles and runs, and dumps both
  * results + their depth-32 oracle SQL for a DuckDB cross-check.
  * Run: `sbt "Test/runMain graft.BenchBpe [outDir]"`. */
object BenchBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.headOption.getOrElse("/tmp/bpe32")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rounds = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.maxPlanStringLength", 1000000)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    graft.text.TextAnalysis.bpeMergeTable(spark, sfDir, rounds,
      (r, sec) => curve += ((r, sec)))
    println(f"[bpe] train $rounds rounds total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println("[bpe] curve " + curve.map { case (r, s) => f"$r:$s%.2f" }.mkString(" "))
    // encoder: one plan with `rounds` chained replace projections —
    // must compile (codegen) and run at depth 32
    val t1 = System.nanoTime()
    val enc = graft.text.TextAnalysis.t21BpeEncode(spark, sfDir, rounds)
    enc.write.mode("overwrite").parquet(s"$out/t21_bpe_encode_32")
    println(f"[bpe] encode depth $rounds ran in ${(System.nanoTime() - t1) / 1e9}%.1f s " +
      s"(wholestage spans: ${enc.queryExecution.executedPlan.toString.linesIterator.count(_.contains("WholeStageCodegen"))})")
    graft.text.TextAnalysis.t20BpeMerges(spark, sfDir, rounds)
      .write.mode("overwrite").parquet(s"$out/t20_bpe_merges_32")
    import org.json4s.JsonDSL._
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      org.json4s.jackson.JsonMethods.compact(
        ("t20_bpe_merges_32" -> graft.text.TextAnalysis.t20Sql(rounds)) ~
        ("t21_bpe_encode_32" -> graft.text.TextAnalysis.t21Sql(rounds))))
    spark.stop()
  }
}
