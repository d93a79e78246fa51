package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing harness for the g5 BFS materialization strategy
  * (round-7 perf work) — not a spec; run with
  * `sbt "Test/runMain graft.BenchG5 <variant,...>"`. */
object BenchG5 {
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
    import spark.implicits._

    graft.dedup.Dedup.d2Pairs(spark, sfDir).count()
    val pairs = graft.dedup.Dedup.d2Pairs(spark, sfDir, threshold = 0.7)
      .select($"doc_id1".as("a"), $"doc_id2".as("b"))
    println(s"[g5] pairs=${pairs.count()}")

    val variants: Map[String, () => DataFrame] = Map(
      "current" -> (() => graft.operators.Graph.bfsHops(pairs, 4)),
      "preedges" -> (() => bfsPreEdges(pairs, 4)),
      "nodist" -> (() => bfsNoDistinct(pairs, 4))
    )
    val names = if (args.isEmpty) variants.keys.toSeq.sorted else args(0).split(",").toSeq
    for (n <- names; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      val cnt = variants(n)().count()
      println(f"[g5] $n%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }

  /** edges normalized + checkpointed ONCE before the loop */
  def bfsPreEdges(pairs: DataFrame, rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").dropDuplicates("a", "b")
    val edges = p.unionAll(p.select($"b".as("a"), $"a".as("b")))
      .repartition($"a").localCheckpoint(true)
    val nodes = edges.select($"a".as("id")).distinct()
    val seeds = edges.groupBy($"a".as("id")).agg(min($"b").as("mn"))
      .filter($"id" < $"mn").select($"id", lit(0L).as("hops"))
    var state = seeds.localCheckpoint(true)
    for (r <- 1 to rounds) {
      val frontier = state.filter($"hops" === (r - 1).toLong)
      val next = edges.join(frontier, edges("a") === frontier("id"))
        .select(edges("b").as("id")).distinct()
        .join(state, Seq("id"), "left_anti")
        .select($"id", lit(r.toLong).as("hops"))
      state = state.unionAll(next).localCheckpoint(true)
    }
    nodes.join(state, Seq("id"), "left")
      .select($"id", coalesce($"hops", lit(-1L)).as("hops"))
  }

  /** distinct folded into the anti-join's shuffle via aggregate */
  def bfsNoDistinct(pairs: DataFrame, rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").dropDuplicates("a", "b")
    val edges = p.unionAll(p.select($"b".as("a"), $"a".as("b")))
      .repartition($"a").localCheckpoint(true)
    val nodes = edges.select($"a".as("id")).distinct()
    val seeds = edges.groupBy($"a".as("id")).agg(min($"b").as("mn"))
      .filter($"id" < $"mn").select($"id", lit(0L).as("hops"))
    var state = seeds.localCheckpoint(true)
    for (r <- 1 to rounds) {
      val frontier = state.filter($"hops" === (r - 1).toLong)
      val next = edges.join(frontier, edges("a") === frontier("id"))
        .groupBy(edges("b").as("id")).agg(lit(r.toLong).as("hops"))
        .join(state, Seq("id"), "left_anti")
        .select($"id", lit(r.toLong).as("hops"))
      state = state.unionAll(next).localCheckpoint(true)
    }
    nodes.join(state, Seq("id"), "left")
      .select($"id", coalesce($"hops", lit(-1L)).as("hops"))
  }
}
