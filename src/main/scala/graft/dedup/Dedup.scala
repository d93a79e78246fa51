package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextAnalysis.{normalize, tokens}

/** Deduplication operators over the `documents` table (SURVEY §2 block D).
  *
  * Scale story (the part that matters at 100 TB):
  *   - exact dedup is one hash-groupBy — a single shuffle on the md5
  *     fingerprint, map-side partial aggregation;
  *   - every near-dup operator generates candidates through a *bucket
  *     self-join* (LSH band key / simhash chunk / prefix block), never
  *     an all-pairs cross join — shuffle volume is proportional to the
  *     number of candidate pairs, not n²;
  *   - signatures are computed with higher-order array functions in one
  *     distributed projection; no driver-side state, no UDFs.
  */
object Dedup {

  /** d1: exact dedup by normalized-text fingerprint. One shuffle. */
  def d1Exact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, dir, "documents")
      .select($"doc_id", md5(normalize($"text")).as("fingerprint"))
      .groupBy($"fingerprint")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
  }

  val d1Sql: String =
    """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Distinct 3-word shingles of normalized text (the unit for MinHash
    * and Jaccard). Empty array when the doc has < 3 tokens. */
  def wordShingles(text: Column): Column = {
    val t = tokens(text)
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: k independent hash functions simulated as
    * xxhash64 with a per-slot salt; sig(j) = min over shingles.
    * Computed as one nested higher-order projection — distributed,
    * stateless, no UDF. */
  def minhashSig(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(shingles, s => xxhash64(concat(j.cast("string"), lit(":"), s)))))

  /** d2: MinHash + banded LSH near-dup pairs.
    *
    * docs → k=32 minhash sig → b=8 bands of r=4 → explode to
    * (band_idx, band_key) rows → self-join on the bucket → verified
    * Jaccard ≥ 0.7 on the surviving candidates only. The bucket join
    * is the only shuffle that grows with data; all-pairs never happens.
    * Bands make P(candidate) ≈ 1-(1-j⁴)⁸ — 0.9-similar docs are caught
    * with p≈0.9998, 0.5-similar mostly pruned.
    *
    * Oracle: rows-only (the banded-LSH pipeline is not reasonably
    * expressible in ANSI SQL); Jaccard verification is covered by the
    * d4 oracle and DedupSpec asserts the planted near-dups are found.
    */
  def d2MinhashLsh(spark: SparkSession, dir: String, k: Int = 32, bands: Int = 8,
                   threshold: Double = 0.7): DataFrame = {
    import spark.implicits._
    val r = k / bands
    val docs = Tables.read(spark, dir, "documents")
      .select($"doc_id", wordShingles($"text").as("shingles"))
      .filter(size($"shingles") > 0)
      .withColumn("sig", minhashSig($"shingles", k))

    // (doc_id, band_idx, band_key): b rows per doc; band key = hash of
    // the r-slot slice, so the join key is small and uniformly spread.
    val buckets = docs.select($"doc_id", $"shingles",
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          hash(slice($"sig", b * r + 1, lit(r))))).as(Seq("band_idx", "band_key")))

    val a = buckets.select($"doc_id".as("doc_id1"), $"shingles".as("sh1"), $"band_idx", $"band_key")
    val b = buckets.select($"doc_id".as("doc_id2"), $"shingles".as("sh2"), $"band_idx", $"band_key")
    val cand = a.join(b, Seq("band_idx", "band_key"))
      .filter($"doc_id1" < $"doc_id2")
      .select($"doc_id1", $"doc_id2", $"sh1", $"sh2")
      .dropDuplicates("doc_id1", "doc_id2")

    val inter = size(array_intersect($"sh1", $"sh2")).cast("double")
    val union = (size($"sh1") + size($"sh2")).cast("double") - inter
    cand.select($"doc_id1", $"doc_id2", round(inter / union, 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
      .orderBy("doc_id1", "doc_id2")
  }

  /** d4: exact n-gram Jaccard on blocked candidate pairs. Blocking key
    * = first 30 chars of normalized text (cheap, SQL-expressible, so
    * this one IS oracle-checked; d2 is the production candidate
    * generator). Join key is the block — never all-pairs. */
  def d4NgramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val docs = Tables.read(spark, dir, "documents")
      .select($"doc_id", substring(normalize($"text"), 1, 30).as("block"),
        wordShingles($"text").as("sh"))
      .filter(size($"sh") > 0)
    val a = docs.select($"doc_id".as("doc_id1"), $"block", $"sh".as("sh1"))
    val b = docs.select($"doc_id".as("doc_id2"), $"block", $"sh".as("sh2"))
    val inter = size(array_intersect($"sh1", $"sh2")).cast("double")
    val union = (size($"sh1") + size($"sh2")).cast("double") - inter
    a.join(b, Seq("block"))
      .filter($"doc_id1" < $"doc_id2")
      .select($"doc_id1", $"doc_id2", round(inter / union, 6).as("jaccard"))
      .filter($"jaccard" >= threshold)
      .orderBy("doc_id1", "doc_id2")
  }

  val d4Sql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 30) AS block,
      |    regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, block,
      |    CASE WHEN len(t) >= 3 THEN list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) ELSE [] END AS sh
      |  FROM tok),
      |cand AS (
      |  SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, a.sh AS sh1, b.sh AS sh2
      |  FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
      |  WHERE len(a.sh) > 0 AND len(b.sh) > 0),
      |j AS (
      |  SELECT doc_id1, doc_id2,
      |    round(CAST(len(list_filter(sh1, x -> list_contains(sh2, x))) AS DOUBLE) /
      |          (len(sh1) + len(sh2) - len(list_filter(sh1, x -> list_contains(sh2, x)))), 6) AS jaccard
      |  FROM cand)
      |SELECT doc_id1, doc_id2, jaccard FROM j
      |WHERE jaccard >= 0.5 ORDER BY doc_id1, doc_id2""".stripMargin

  /** d3: SimHash near-dup candidates.
    *
    * 64-bit simhash per doc from token hashes (each hash bit votes
    * ±1; the sign of the per-bit sum is the signature bit), held as
    * 8 chunks of 8 bits. Pigeonhole: two docs within hamming ≤ 7 must
    * agree on ≥ 1 chunk, so candidates come from an equi-join on
    * (chunk_idx, chunk_value) — again no all-pairs. Exact hamming
    * (popcount of xor over chunks) filters the candidates.
    * Rows-only oracle; DedupSpec pins behavior. */
  def d3Simhash(spark: SparkSession, dir: String, maxHamming: Int = 7): DataFrame = {
    import spark.implicits._
    val nChunks = 8
    val bitsPerChunk = 8
    val toks = tokens($"text")
    // per-bit vote sums: fold the tokens' 64-bit hashes (as binary
    // strings — the DSL's shiftright takes only literal shifts) into a
    // 64-long ±1 vote vector, LSB first
    val zero = transform(sequence(lit(0), lit(63)), _ => lit(0L))
    val votes = aggregate(
      transform(toks, t => lpad(bin(xxhash64(t)), 64, "0")),
      zero,
      (acc, bits) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(bits.substr(lit(64) - i, lit(1)) === "1", 1L).otherwise(-1L)))
    // pack sign bits into 8-bit chunks (pow is exact for 2^0..2^7)
    val chunks = transform(sequence(lit(0), lit(nChunks - 1)), c =>
      aggregate(sequence(lit(0), lit(bitsPerChunk - 1)), lit(0L),
        (acc, i) => acc + when(
          element_at(votes, c * bitsPerChunk + i + 1) > 0,
          pow(lit(2.0), i.cast("double")).cast("long")).otherwise(lit(0L))))

    val docs = Tables.read(spark, dir, "documents")
      .select($"doc_id", chunks.as("chunks"))

    val buckets = docs.select($"doc_id", $"chunks",
      posexplode($"chunks").as(Seq("chunk_idx", "chunk_val")))
    val a = buckets.select($"doc_id".as("doc_id1"), $"chunks".as("ch1"), $"chunk_idx", $"chunk_val")
    val b = buckets.select($"doc_id".as("doc_id2"), $"chunks".as("ch2"), $"chunk_idx", $"chunk_val")
    val hamming = aggregate(
      zip_with($"ch1", $"ch2", (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter($"doc_id1" < $"doc_id2")
      .dropDuplicates("doc_id1", "doc_id2")
      .select($"doc_id1", $"doc_id2", hamming.as("hamming"))
      .filter($"hamming" <= maxHamming)
      .orderBy("doc_id1", "doc_id2")
  }

  /** Cosine similarity between two float-array columns, computed in
    * double precision (deterministic left-to-right fold). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    def norm(v: Column) = sqrt(aggregate(
      transform(v, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x))
    dot / (norm(a) * norm(b))
  }

  /** d5: embedding near-dup — top-50 most-cosine-similar pairs.
    *
    * At verify scale this is the brute-force quadratic baseline (the
    * corpus side is broadcast); the 100 TB path is the LSH-bucketed
    * join in [[graft.similarity.Knn.s2Ivf]] — same scoring, candidate
    * generation via random-hyperplane buckets instead of all pairs.
    * Oracle-checked against DuckDB's unnest arithmetic. */
  def d5EmbeddingNearDup(spark: SparkSession, dir: String, topN: Int = 50): DataFrame = {
    import spark.implicits._
    val e = Tables.read(spark, dir, "embeddings")
    val a = e.select($"vec_id".as("vec_id1"), $"embedding".as("e1"))
    val b = e.select($"vec_id".as("vec_id2"), $"embedding".as("e2"))
    a.join(b, $"vec_id1" < $"vec_id2")
      .select($"vec_id1", $"vec_id2", round(cosine($"e1", $"e2"), 6).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id1", $"vec_id2")
      .limit(topN)
  }

  val d5Sql: String =
    """WITH u AS (
      |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
      |         generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
      |    sum(a.v * b.v) / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))) AS c
      |  FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
      |  GROUP BY 1, 2)
      |SELECT vec_id1, vec_id2, round(c, 6) AS cos_sim
      |FROM p ORDER BY round(c, 6) DESC, vec_id1, vec_id2 LIMIT 50""".stripMargin
}
