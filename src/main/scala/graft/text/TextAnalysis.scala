package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators over the `documents` table (SURVEY §2 block F).
  *
  * Everything here is pure `org.apache.spark.sql.functions._` arithmetic
  * and higher-order array functions — no UDFs — so each query stays a
  * single whole-stage-codegen'd projection over the parquet scan (only
  * the columns used are read, verified via ReadSchema). That is the
  * property that matters at 100 TB: these are embarrassingly parallel
  * per-row transforms with zero shuffle.
  *
  * Heuristics (stopword-ratio language ID, quality score, token counts,
  * fingerprint) are deterministic and expressible identically in ANSI
  * SQL, so every query in this block is DuckDB-oracle-checked.
  */
object TextAnalysis {

  /** Lowercased, punctuation-collapsed, trimmed view of a text column. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of normalized text. */
  def tokens(c: Column): Column = split(normalize(c), " ")

  // Tiny per-language stopword lists — enough for a ratio heuristic.
  // (The reference has no text ops; this block is the LLM-pipeline
  // extension required by the brief.)
  val enStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val frStop: Seq[String] = Seq("le", "la", "de", "et", "un", "une", "les", "des", "en", "est")
  val esStop: Seq[String] = Seq("el", "lo", "y", "una", "los", "que", "por", "con", "para", "se")

  private def hitRatio(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    round(size(filter(toks, t => array_contains(set, t))).cast("double") /
      greatest(size(toks), lit(1)), 6)
  }

  /** t1: stopword-ratio language ID. One projection, no shuffle. */
  def t1LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    Tables.read(spark, dir, "documents")
      .select($"doc_id",
        hitRatio(toks, enStop).as("en_ratio"),
        hitRatio(toks, frStop).as("fr_ratio"),
        hitRatio(toks, esStop).as("es_ratio"))
      .withColumn("pred_lang",
        when($"en_ratio" >= $"fr_ratio" && $"en_ratio" >= $"es_ratio", "en")
          .when($"fr_ratio" >= $"es_ratio", "fr")
          .otherwise("es"))
      .orderBy("doc_id")
  }

  private def stopListSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private def ratioSql(words: Seq[String]): String =
    s"round(CAST(len(list_filter(toks, t -> list_contains(${stopListSql(words)}, t))) AS DOUBLE) / greatest(len(toks), 1), 6)"

  val t1Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    ${ratioSql(enStop)} AS en_ratio,
       |    ${ratioSql(frStop)} AS fr_ratio,
       |    ${ratioSql(esStop)} AS es_ratio
       |  FROM tok)
       |SELECT doc_id, en_ratio, fr_ratio, es_ratio,
       |  CASE WHEN en_ratio >= fr_ratio AND en_ratio >= es_ratio THEN 'en'
       |       WHEN fr_ratio >= es_ratio THEN 'fr' ELSE 'es' END AS pred_lang
       |FROM r ORDER BY doc_id""".stripMargin

  /** t2: document quality score — length, stopword and word-shape
    * ratios combined into one deterministic [0,1] score. Codegen'd. */
  def t2QualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = tokens($"text")
    Tables.read(spark, dir, "documents")
      .select($"doc_id", $"text", toks.as("toks"))
      .select($"doc_id",
        length($"text").as("n_chars"),
        size($"toks").as("n_tokens"),
        round(aggregate(transform($"toks", t => length(t)), lit(0), (a, x) => a + x)
          .cast("double") / greatest(size($"toks"), lit(1)), 6).as("avg_token_len"),
        hitRatio($"toks", enStop).as("stop_ratio"))
      .withColumn("quality",
        round(least(($"n_tokens" / 100.0), lit(1.0)) * 0.5 +
          $"stop_ratio" * 0.3 +
          least($"avg_token_len" / 10.0, lit(1.0)) * 0.2, 6))
      .orderBy("doc_id")
  }

  val t2Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |    regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, n_chars, len(toks) AS n_tokens,
       |    round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / greatest(len(toks), 1), 6) AS avg_token_len,
       |    ${ratioSql(enStop)} AS stop_ratio
       |  FROM tok)
       |SELECT doc_id, n_chars, n_tokens, avg_token_len, stop_ratio,
       |  round(least(n_tokens / 100.0, 1.0) * 0.5 + stop_ratio * 0.3 +
       |        least(avg_token_len / 10.0, 1.0) * 0.2, 6) AS quality
       |FROM m ORDER BY doc_id""".stripMargin

  /** t3: token counting — whitespace tokens, regex word tokens, and a
    * BPE-ish `ceil(chars/4)` subword estimate. */
  def t3TokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, dir, "documents")
      .select($"doc_id",
        size(split(trim($"text"), "\\s+")).as("ws_tokens"),
        size(regexp_extract_all($"text", lit("[A-Za-z0-9]+"), lit(0))).as("re_tokens"),
        ceil(length($"text") / 4.0).cast("long").as("bpe_est"))
      .orderBy("doc_id")
  }

  val t3Sql: String =
    """SELECT doc_id,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS re_tokens,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t4: document fingerprint — md5 over normalized text (the exact
    * dedup key; d1 groups on it). */
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, dir, "documents")
      .select($"doc_id", md5(normalize($"text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  val t4Sql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** t5: stable train/val/test split — assignment from a hash of the
    * CONTENT fingerprint, not the row id, so the split survives
    * re-ingestion, re-partitioning, and id reassignment (the property
    * a training pipeline actually needs; duplicate texts always land
    * in the same split, preventing train/test leakage). 90/5/5 by
    * hex-hash mod 100. */
  def t5StableSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = conv(substring(md5(normalize($"text")), 1, 6), 16, 10)
      .cast("long") % 100
    Tables.read(spark, dir, "documents")
      .select($"doc_id", bucket.as("bucket"))
      .withColumn("split",
        when($"bucket" < 90, "train").when($"bucket" < 95, "val").otherwise("test"))
      .orderBy("doc_id")
  }

  /** t6: corpus vocabulary statistics — top-20 tokens by frequency plus
    * per-token document frequency. One explode + one shuffle on the
    * token; global top-k via orderBy+limit (TakeOrderedAndProject). */
  def t6VocabStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.read(spark, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("term_freq"),
        countDistinct($"doc_id").as("doc_freq"))
      .orderBy($"term_freq".desc, $"token")
      .limit(20)
  }

  val t6Sql: String =
    """SELECT token, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
      |FROM (
      |  SELECT doc_id, unnest(regexp_split_to_array(
      |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
      |  FROM documents) t
      |GROUP BY token ORDER BY term_freq DESC, token LIMIT 20""".stripMargin

  val t5Sql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))), 1, 6)) AS BIGINT) % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin
}
