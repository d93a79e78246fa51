package graft

import org.apache.spark.sql.SparkSession

/** Throwaway measurement probe (test-scope tooling, not library
  * surface): prices the walk's THIRD dial — rounds — at the s38
  * operating points, backing the corpus-ceiling note in s32's
  * scaladoc with a measured number instead of a conjecture.
  *
  * Usage: Test/runMain graft.ProbeRounds [sfDir] [rounds] */
object ProbeRounds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.similarity.Knn.s38DegreeSweep(spark, dir, rounds = rounds)
      .collect().foreach(r => println(s"[probe] rounds=$rounds $r"))
    // the graph-QUALITY dial: a second NN-descent refinement round
    // over the degree-16 graph, walked at b16 × the same rounds —
    // prices whether the sf0.1 recall ceiling is walk depth (no: the
    // walk converges) or index build depth
    import org.apache.spark.sql.functions.col
    import graft.similarity.Knn
    val ref1 = graft.operators.Indexes.memo(s"probe_ref1:$dir") {
      Knn.nnDescentRoundOver(spark, dir, 16,
        Knn.s17KnnGraphOn(spark, dir, 16, org.apache.spark.sql.functions.lit(true))
          .select(col("src_id"), col("neighbor_id")))
        .select(col("src_id"), col("neighbor_id"))
    }
    val ref2 = graft.operators.Indexes.memo(s"probe_ref2:$dir") {
      Knn.nnDescentRoundOver(spark, dir, 16, ref1)
        .select(col("src_id"), col("neighbor_id"))
    }
    def sym(g: org.apache.spark.sql.DataFrame) = g.unionAll(
        g.select(col("neighbor_id").as("src_id"), col("src_id").as("neighbor_id")))
      .dropDuplicates("src_id", "neighbor_id")
    val cents = Knn.lloydCentroids(spark, dir)
    val exact = Knn.s1Brute(spark, dir, 5)
      .select(col("query_id").as("eq"), col("neighbor_id").as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((tag, g) <- Seq("ref1" -> ref1, "ref2" -> ref2)) {
      val topk = Knn.graphWalkParts(spark, dir, sym(g), cents, 5, 16, rounds)._2
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = exact.count(topk.contains)
      println(s"[probe] d16 b16 r$rounds $tag: recall@5 = ${hits}/${exact.size}")
    }
    spark.stop()
  }
}
