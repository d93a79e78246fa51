package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw-corpus ingestion: newline-delimited JSON with an EXPLICIT
  * schema and a corrupt-record quarantine — the shape web-crawl data
  * actually arrives in at scale (jsonl shards), done the way a 100 TB
  * read must be done:
  *
  *  - NO schema inference (inference is a full extra pass over the
  *    data, and a schema that drifts with the sample is a silent
  *    correctness bug; the pipeline owner declares the contract);
  *  - ONE scan: lines are read as text and parsed with `from_json`
  *    per row — a codegen'd expression, splittable input, no
  *    PERMISSIVE-mode caching footgun (filtering Spark's
  *    `_corrupt_record` alone on a raw json read is disallowed /
  *    requires a cache of the raw frame; parsing from `text` keeps
  *    the raw line for free);
  *  - NOTHING dropped silently: every input line is exactly one row
  *    of `good` or one row of `quarantine` (raw line + reason), so
  *    counts reconcile and bad shards are re-processable;
  *  - a per-field NULL-RATE report as the drift canary: a field the
  *    schema declares but the data stopped carrying shows up as a
  *    null-rate jump, not as a downstream NPE three jobs later.
  *
  * The reference ingests over JDBC (connection.js); this is the
  * file-drop twin of that surface for the training-data pipeline.
  */
object Ingest {

  /** Parsed jsonl split: every line lands in exactly one frame.
    * `good` carries the schema's columns; `quarantine` carries
    * (line, reason) with reason ∈ {malformed_json, missing_required}. */
  final case class JsonlSplit(good: DataFrame, quarantine: DataFrame)

  /** Read a jsonl file/directory against an explicit schema.
    *
    * `required` names fields that must be non-null for a row to be
    * good (natural keys, payload columns the pipeline cannot proceed
    * without); rows where they are null — either absent in the JSON
    * or present as null — quarantine as `missing_required`. Fields
    * not in `required` may be null in `good` (optional columns), and
    * their null rate is what [[driftReport]] watches.
    *
    * `from_json` in FAILFAST would kill the job on one bad shard; in
    * default PERMISSIVE it yields a row of nulls for malformed input,
    * indistinguishable from an all-null record. Malformed-vs-missing
    * is decided exactly with the parser's own corrupt-record channel:
    * the parse schema carries an extra `_graft_corrupt` field wired
    * via `columnNameOfCorruptRecord`, which is non-null iff the line
    * failed to parse as JSON. */
  def jsonl(spark: SparkSession, path: String, schema: StructType,
            required: Seq[String]): JsonlSplit = {
    require(!schema.fieldNames.contains("_graft_corrupt"),
      "_graft_corrupt is reserved for the corrupt-record channel")
    val schemaPlus = schema.add("_graft_corrupt",
      org.apache.spark.sql.types.StringType)
    val parsed = spark.read.textFile(path).toDF("line")
      .withColumn("j", from_json(col("line"), schemaPlus,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_graft_corrupt")))
    val reqNull: Column = required
      .map(f => col(s"j.$f").isNull)
      .foldLeft(lit(false))(_ || _)
    val tagged = parsed.withColumn("reason",
      when(col("j").isNull || col("j._graft_corrupt").isNotNull, "malformed_json")
        .when(reqNull, "missing_required"))
    val good = tagged.filter(col("reason").isNull)
      .select(schema.fieldNames.map(f => col(s"j.$f").as(f)).toSeq: _*)
    val quarantine = tagged.filter(col("reason").isNotNull)
      .select(col("line"), col("reason"))
    JsonlSplit(good, quarantine)
  }

  /** Per-field null-rate drift report over a good frame: one row per
    * column with (n_rows, n_null, null rate ×1e6 half-up). A schema
    * field the upstream stopped emitting is a null-rate jump here —
    * the canary to alert on, per ingest batch. Single scan, one
    * map-side-combinable global aggregate, |columns|-sized output. */
  def driftReport(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = count(lit(1))
    val aggs = n.as("n_rows") +:
      df.columns.toSeq.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val cols = df.columns.toSeq
    wide.select(
      explode(array(cols.map(c => struct(
        lit(c).as("field"), col("n_rows"),
        col(s"null_$c").as("n_null"),
        graft.functions.IntMath.halfUpDiv(col(s"null_$c") * 1000000L,
          greatest(col("n_rows"), lit(1L))).as("null_rate_e6"))): _*)).as("r"))
      .select($"r.field", $"r.n_rows", $"r.n_null", $"r.null_rate_e6")
  }
}
