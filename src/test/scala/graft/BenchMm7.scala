package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness for mm7's signature-width scale dial —
  * not a spec; run with
  * `SPARK_GRAFT_SF_DIR=target/sf1 sbt "Test/runMain graft.BenchMm7"`.
  * Times the band join + verify at segs=32 (4-bit keys, the 1/16
  * collision floor) vs segs=64 (8-bit keys, the REGISTERED width) on
  * the same planted corpus. r12 sf1 (hot 10-clone families): segs=64
  * 3.5 s warm emitting EXACTLY the true-pair set (255,200 — zero
  * collision noise); segs=32 23.0 s emitting 569,100 (313,900 of them
  * noise). */
object BenchMm7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    for (segs <- Seq(32, 64); pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.multimodal.Media.mm7PhashNearDup(spark, sfDir, segs = segs).count()
      println(f"[mm7] segs=$segs pass=$pass ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$n")
    }
    spark.stop()
  }
}
