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
      .config("spark.sql.maxPlanStringLength", 1000000)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val (bands, r, dim) = (8, 8, 64)
    // optional xN corpus inflation (sf1-equivalent audit): N perturbed
    // copies, noise deterministic per (copy, vec_id, dim) — additive,
    // NOT a scale (scaling preserves hyperplane signs and would pin
    // every clone into all 8 of its source's buckets), so clones are
    // near-dups that co-collide in SOME bands, the near-dup-heavy
    // regime where per-collision scoring is most duplicated
    val x = args.headOption.map(_.toInt).getOrElse(1)
    val base = graft.sources.Tables.read(spark, sfDir, "embeddings")
    val maxId = base.agg(max($"vec_id")).head.getLong(0) + 1
    val corpus =
      if (x <= 1) base
      else (0 until x).map { c =>
        base.select(($"vec_id" + c * maxId).as("vec_id"),
          expr(s"transform(embedding, (v, i) -> v + CAST(" +
            s"(pmod(hash(vec_id, i, $c), 41) - 20) AS FLOAT) * 0.01F)").as("embedding"))
      }.reduce(_ unionAll _)
    val e = corpus
      .select($"vec_id", graft.similarity.Lsh.bandKeys($"embedding", bands, r, dim).as("bkeys"))
    val b = e.select($"vec_id", posexplode($"bkeys").as(Seq("band_idx", "band_key")))
    val coll = b.select($"vec_id".as("s"), $"band_idx", $"band_key")
      .join(b.select($"vec_id".as("d"), $"band_idx", $"band_key"), Seq("band_idx", "band_key"))
      .filter($"s" =!= $"d")
    val n = coll.count()
    val distinct = coll.select($"s", $"d").distinct().count()
    println(f"[s17] x$x collisions=$n distinct=$distinct dupFactor=${n.toDouble / distinct}%.3f")
    // registered-query timing at the base sf for reference
    if (x <= 1) for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.similarity.Knn.s17KnnGraph(spark, sfDir).count()
      println(f"[s17] current    ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
