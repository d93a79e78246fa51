package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement: s17's band-collision duplication factor —
  * cosines are computed per collision and deduped after, so the wasted
  * work is (collisions − distinct pairs) dot products. Run with
  * `sbt "Test/runMain graft.BenchS17"`. */
object BenchS17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val (bands, r, dim) = (8, 8, 64)
    val e = graft.sources.Tables.read(spark, sfDir, "embeddings")
      .select($"vec_id", graft.similarity.Lsh.bandKeys($"embedding", bands, r, dim).as("bkeys"))
    val b = e.select($"vec_id", posexplode($"bkeys").as(Seq("band_idx", "band_key")))
    val coll = b.select($"vec_id".as("s"), $"band_idx", $"band_key")
      .join(b.select($"vec_id".as("d"), $"band_idx", $"band_key"), Seq("band_idx", "band_key"))
      .filter($"s" =!= $"d")
    val n = coll.count()
    val distinct = coll.select($"s", $"d").distinct().count()
    println(f"[s17] collisions=$n distinct=$distinct dupFactor=${n.toDouble / distinct}%.3f")
    // per-round timing of both orders at this sf for reference
    for (_ <- 1 to 2) {
      var t0 = System.nanoTime()
      graft.similarity.Knn.s17KnnGraph(spark, sfDir).count()
      println(f"[s17] current    ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
