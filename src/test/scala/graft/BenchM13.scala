package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness for the m13-family orchestrator artifact
  * (round-10 perf work, VERDICT r9 task 6) — not a spec; run with
  * `sbt "Test/runMain graft.BenchM13"`. Times the sharedRun
  * materialization (merged + idMap per table, concurrently like the
  * Bench artifact chain) in ISOLATION, with per-table breakdown. */
object BenchM13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val mts = graft.merge.OrchestratorQueries.sharedRun(spark, sfDir)
    val tRun = (System.nanoTime() - t0) / 1e9
    println(f"[m13] sharedRun construction (incl. eager cuts) $tRun%8.2f s")
    val p = java.util.concurrent.Executors.newFixedThreadPool(4)
    val perTable = mts.toSeq.map { case (name, mt) =>
      name -> p.submit(new java.util.concurrent.Callable[Double] {
        def call(): Double = {
          val t = System.nanoTime()
          mt.merged.count(); mt.idMap.count()
          (System.nanoTime() - t) / 1e9
        }
      })
    }
    perTable.foreach { case (n, f) => println(f"[m13] $n%-10s ${f.get()}%8.2f s (merged+idMap count)") }
    p.shutdown()
    println(f"[m13] TOTAL ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    spark.stop()
  }
}
