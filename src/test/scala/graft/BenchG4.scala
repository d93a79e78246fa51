package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing harness for the g4 k-core materialization strategy
  * (round-6 perf work) — not a spec; run with
  * `sbt "Test/runMain graft.BenchG4 <variant,...>"`. */
object BenchG4 {
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

    // warm the pair artifact so variants time only the peel
    graft.dedup.Dedup.d2Pairs(spark, sfDir).count()
    val pairs = graft.dedup.Dedup.d2Pairs(spark, sfDir, threshold = 0.7)
      .select($"doc_id1".as("a"), $"doc_id2".as("b"))
    println(s"[g4] pairs=${pairs.count()}")

    val variants: Map[String, () => DataFrame] = Map(
      "current" -> (() => graft.operators.Graph.kCore(pairs, 2, 3)),
      "chk" -> (() => kCoreChk(pairs, 2, 3)),
      "lazyplain" -> (() => kCoreLazy(pairs, 2, 3)),
      "diedcount" -> (() => kCoreDied(pairs, 2, 3))
    )
    val names = if (args.isEmpty) variants.keys.toSeq.sorted else args(0).split(",").toSeq
    for (n <- names; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      val cnt = variants(n)().count()
      println(f"[g4] $n%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }

  /** round-5 shape: eager localCheckpoint per round */
  def kCoreChk(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").dropDuplicates("a", "b")
    val edges = p.unionAll(p.select($"b".as("a"), $"a".as("b")))
    var alive = edges.select($"a".as("id")).distinct()
    var peeled = spark.emptyDataFrame.withColumn("id", lit(0L))
      .withColumn("peel_round", lit(0L)).limit(0).select($"id", $"peel_round")
    for (r <- 1 to rounds) {
      val sub = edges
        .join(alive.select($"id".as("__a")), $"a" === $"__a", "left_semi")
        .join(alive.select($"id".as("__b")), $"b" === $"__b", "left_semi")
      val deg = sub.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val out = alive.join(deg, Seq("id"), "left")
        .filter(coalesce($"deg", lit(0L)) < k)
        .select($"id", lit(r.toLong).as("peel_round"))
      peeled = peeled.unionAll(out)
      alive = deg.filter($"deg" >= k).select($"id")
    }
    finish(edges, alive, peeled, k)
  }

  /** no materialization at all — relies on ReuseExchange */
  def kCoreLazy(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").dropDuplicates("a", "b")
    val edges = p.unionAll(p.select($"b".as("a"), $"a".as("b")))
    var alive = edges.select($"a".as("id")).distinct()
    var peeled = spark.emptyDataFrame.withColumn("id", lit(0L))
      .withColumn("peel_round", lit(0L)).limit(0).select($"id", $"peel_round")
    for (r <- 1 to rounds) {
      val sub = edges
        .join(alive.select($"id".as("__a")), $"a" === $"__a", "left_semi")
        .join(alive.select($"id".as("__b")), $"b" === $"__b", "left_semi")
      val deg = sub.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
      val out = alive.join(deg, Seq("id"), "left")
        .filter(coalesce($"deg", lit(0L)) < k)
        .select($"id", lit(r.toLong).as("peel_round"))
      peeled = peeled.unionAll(out)
      alive = deg.filter($"deg" >= k).select($"id")
    }
    finish(edges, alive, peeled, k)
  }

  /** died-count reformulation: deg_r = deg_0 - cumulative dead-neighbor
    * counts; per round one edges×died join, everything else node-sized;
    * one localCheckpoint per round on the (tiny) died frame only. */
  def kCoreDied(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .filter($"a" =!= $"b").dropDuplicates("a", "b")
    val edges = p.unionAll(p.select($"b".as("a"), $"a".as("b")))
    val deg0 = edges.groupBy($"a".as("id")).agg(count(lit(1)).as("deg"))
    // (id, deg, peel_round so far: 0 = alive)
    var st = deg0.withColumn("peel_round",
      when($"deg" < k, lit(1L)).otherwise(lit(0L))).localCheckpoint(true)
    for (r <- 2 to rounds) {
      val died = st.filter($"peel_round" === (r - 1)).select($"id".as("dead"))
      val lost = edges.join(died, $"b" === $"dead")
        .groupBy($"a".as("id")).agg(count(lit(1)).as("lost"))
      st = st.join(lost, Seq("id"), "left")
        .select($"id", ($"deg" - coalesce($"lost", lit(0L))).as("deg"),
          when($"peel_round" =!= 0L, $"peel_round")
            .when($"deg" - coalesce($"lost", lit(0L)) < k, lit(r.toLong))
            .otherwise(lit(0L)).as("peel_round"))
        .localCheckpoint(true)
    }
    val alive = st.filter($"peel_round" === 0L).select($"id")
    val peeled = st.filter($"peel_round" =!= 0L).select($"id", $"peel_round")
    finish(edges, alive, peeled, k)
  }

  private def finish(edges: DataFrame, alive: DataFrame, peeled: DataFrame,
                     k: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val finalEdges = edges
      .join(alive.select($"id".as("__a")), $"a" === $"__a", "left_semi")
      .join(alive.select($"id".as("__b")), $"b" === $"__b", "left_semi")
    val finalDeg = finalEdges.groupBy($"a".as("id")).agg(count(lit(1)).as("core_deg"))
    val core = alive.join(finalDeg, Seq("id"), "left")
      .select($"id", lit(0L).as("peel_round"),
        coalesce($"core_deg", lit(0L)).as("core_deg"))
    peeled.withColumn("core_deg", lit(0L)).unionAll(core)
  }
}
