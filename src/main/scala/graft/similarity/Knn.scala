package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.dedup.Dedup.{dot, vecNorm}

/** Similarity search over the `embeddings` table (SURVEY §2 block E).
  *
  * s1 is the exact baseline: broadcast the (small) query set against
  * the corpus — the corpus is never shuffled, the scan streams through
  * a broadcast hash of queries, and per-query top-k is one window over
  * the query key. At 100 TB the corpus side stays partition-parallel.
  *
  * s2 is the approximate scale path (random-hyperplane LSH per
  * Charikar STOC 2002, the IVF-style bucket-probe shape of
  * Johnson/Douze/Jégou's billion-scale similarity search): it assigns
  * every vector an 8-bit bucket; search touches only the query's
  * bucket (≈ 1/256 of the corpus). Hyperplanes are plan-time literals
  * from fixed seeds, so results are reproducible across runs/clusters.
  */
object Knn {

  /** s1: exact top-k cosine neighbors for query vectors (vec_id < 10)
    * against the rest of the corpus. */
  def s1Brute(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = Tables.read(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", vecNorm($"embedding").as("nrm"))
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"nrm".as("qn"))
    // repartition: the corpus side must parallelize even off one split
    val corpus = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("neighbor_id"), $"embedding".as("c"), $"nrm".as("cn"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    corpus.join(broadcast(queries))
      .select($"query_id", $"neighbor_id",
        round(dot($"q", $"c") / ($"qn" * $"cn"), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .orderBy("query_id", "rank")
  }

  val s1Sql: String =
    """WITH u AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |s AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(sum(q.v * c.v) / (sqrt(sum(q.v * q.v)) * sqrt(sum(c.v * c.v))), 6) AS cos_sim
      |  FROM u q JOIN u c ON q.i = c.i AND q.vec_id < 10 AND c.vec_id >= 10
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      |  FROM s)
      |SELECT query_id, neighbor_id, cos_sim, rank FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Deterministic random hyperplanes, materialized as array LITERALS
    * at plan time (seeded per plane) — zero per-row regeneration cost,
    * reproducible across runs and clusters. */
  private def hyperplanes(nPlanes: Int, dim: Int): Seq[Column] =
    (0 until nPlanes).map { j =>
      val rng = new scala.util.Random(42L + j)
      array((0 until dim).map(_ => lit(rng.nextDouble() * 2.0 - 1.0)): _*)
    }

  /** LSH bucket code: bit j = sign of dot(v, plane_j); literal shift
    * amounts keep the packing codegen-friendly. */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column =
    hyperplanes(nPlanes, dim).zipWithIndex.map { case (plane, j) =>
      val d = aggregate(zip_with(v, plane, (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** s3: embedding k-means clustering — the data-curation staple
    * (topic balancing, stratified sampling, near-dup triage). Built on
    * MLlib's KMeans (k-means|| init, seeded → deterministic for a
    * fixed input layout); `array_to_vector` bridges the raw
    * array<float> column without a UDF. Output is cluster sizes +
    * per-cluster mean norm — stable aggregate shape. Rows-only oracle
    * (k-means isn't expressible in ANSI SQL); KnnSpec pins k,
    * determinism, and total coverage. */
  def s3Cluster(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    val e = Tables.read(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", vecNorm($"embedding").as("nrm"))
      .withColumn("features", org.apache.spark.ml.functions.array_to_vector($"embedding"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(42L).setMaxIter(10).setFeaturesCol("features")
      .fit(e)
    model.transform(e)
      .groupBy($"prediction".as("cluster"))
      .agg(count(lit(1)).as("n_vectors"), round(avg($"nrm"), 4).as("mean_norm"))
      .orderBy("cluster")
  }

  /** s2: IVF/LSH-bucketed approximate top-k — same queries/corpus split
    * as s1, but the join key is the bucket, so each query scans ~1/256
    * of the corpus. Rows-only oracle; KnnSpec measures recall vs s1. */
  def s2Ivf(spark: SparkSession, dir: String, k: Int = 5, nPlanes: Int = 8,
            dimOverride: Int = -1): DataFrame = {
    import spark.implicits._
    // hyperplanes are plan-time literals, so the dimension must be
    // known up front; detect it from the data (one cheap first-row
    // action) — a mismatched hardcoded dim would null-pad zip_with and
    // silently collapse every vector into bucket 0
    val dim =
      if (dimOverride > 0) dimOverride
      else Tables.read(spark, dir, "embeddings")
        .select(size($"embedding")).head().getInt(0)
    val e = Tables.read(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", vecNorm($"embedding").as("nrm"),
        lshBucket($"embedding", nPlanes, dim).as("bucket"))
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"nrm".as("qn"), $"bucket")
    val corpus = e.filter($"vec_id" >= 10)
      .select($"vec_id".as("neighbor_id"), $"embedding".as("c"), $"nrm".as("cn"), $"bucket")
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    corpus.join(broadcast(queries), Seq("bucket"))
      .select($"query_id", $"neighbor_id",
        round(dot($"q", $"c") / ($"qn" * $"cn"), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .orderBy("query_id", "rank")
  }
}
