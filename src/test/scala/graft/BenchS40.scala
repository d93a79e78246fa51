package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing harness decomposing s40's registered cost — not a
  * spec. `SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.BenchS40"`. */
object BenchS40 {
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
    import spark.implicits._
    import graft.similarity.Knn
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[s40] $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    t("fadj_build")  { Knn.walkDeleteAdjacency(spark, sfDir).count() }
    t("fadj_count2") { Knn.walkDeleteAdjacency(spark, sfDir).count() }
    val cents = Knn.lloydCentroids(spark, sfDir)
    val live = pmod(col("vec_id"), lit(8)) =!= 3
    t("walk_pass1")  { Knn.graphWalkParts(spark, sfDir,
      Knn.walkDeleteAdjacency(spark, sfDir), cents, 5, 4, 3, live = live)._2.count() }
    t("walk_pass2")  { Knn.graphWalkParts(spark, sfDir,
      Knn.walkDeleteAdjacency(spark, sfDir), cents, 5, 4, 3, live = live)._2.count() }
    t("s39_walk")    { Knn.graphWalkParts(spark, sfDir,
      Knn.walkAttachAdjacency(spark, sfDir), cents, 5, 4, 3)._2.count() }
    t("full_s40")    { Knn.s40WalkDelete(spark, sfDir).count() }
    t("full_s39")    { Knn.s39WalkInsert(spark, sfDir).count() }
    spark.stop()
  }
}
