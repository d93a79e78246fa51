package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §5).
  *
  * AQE's skew-join splitting handles sort-merge skew automatically at
  * runtime, but a *planned* salted join is still the right tool when a
  * handful of hot keys dominate (the OpenMRS merge has exactly this
  * shape: a few `person_id`s own millions of obs rows). Salting keeps
  * every task bounded: hot fact keys spread over `buckets` sub-keys,
  * the dim side replicates `buckets`× — shuffle grows by the dim size,
  * task skew disappears.
  */
object Skew {

  /** Skew-safe equi-join of a (large, possibly skewed) fact side
    * against a (smaller) dim side.
    *
    * @param saltSrc any fact column with per-row variety (a unique id
    *                is ideal); the salt must be deterministic — no
    *                rand() — so retried tasks produce identical rows.
    */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
                 buckets: Int, saltSrc: Column): DataFrame = {
    // pmod(_, 0) is NULL → a silent empty join; fail fast instead
    require(buckets > 0, s"saltedJoin requires buckets > 0, got $buckets")
    val sf = fact.withColumn("__salt_f", pmod(hash(saltSrc), lit(buckets)))
    val sd = dim.withColumn("__salt_d", explode(sequence(lit(0), lit(buckets - 1))))
    sf.join(sd, sf(factKey) === sd(dimKey) && sf("__salt_f") === sd("__salt_d"))
      .drop("__salt_f", "__salt_d")
  }

  /** AUDIT-DRIVEN salt sizing — the j2 heavy-key metric applied at
    * plan time. The disease salting cures is ONE join task holding a
    * disproportionate share of the fact, so the signal is the hottest
    * key's SHARE of all rows (a mean-ratio test goes blind exactly
    * when skew is total — a single-key fact has max == mean): 0
    * (don't salt) while the hottest key holds ≤ `hotShare` of the
    * fact, else enough buckets that each slice lands well under the
    * threshold (2·share/hotShare, capped — shuffle volume grows by
    * dim×buckets, so runaway hot keys must not replicate the dim
    * without bound). One map-side-combined key histogram + a 1-row
    * driver collect: planning-time cost, the same pass j2's audit
    * already prices. Deterministic — no sampling. */
  def autoBuckets(fact: DataFrame, key: String, hotShare: Double = 0.125,
                  maxBuckets: Int = 32): Int =
    autoBucketsAll(fact, Seq(key), hotShare, maxBuckets).getOrElse(key, 0)

  /** [[autoBuckets]] for SEVERAL key columns in ONE pass over the
    * fact: the keys melt into (key_name, value) rows (values cast to
    * string — count semantics unchanged), so a table declaring four
    * fks pays one scan, not four — at plan time over a JDBC-backed
    * fact that is the difference between one remote pull and N.
    * Returns only the keys that SHOULD salt (share > hotShare). */
  def autoBucketsAll(fact: DataFrame, keys: Seq[String],
                     hotShare: Double = 0.125,
                     maxBuckets: Int = 32): Map[String, Int] = {
    if (keys.isEmpty) return Map.empty
    val melted = fact.select(explode(array(keys.map(k =>
        struct(lit(k).as("fk"), col(k).cast("string").as("v"))): _*)).as("r"))
      .select(col("r.fk").as("fk"), col("r.v").as("v"))
      .filter(col("v").isNotNull)
    melted.groupBy(col("fk"), col("v")).agg(count(lit(1)).as("c"))
      .groupBy(col("fk")).agg(max(col("c")).as("mx"), sum(col("c")).as("n"))
      .collect()
      .flatMap { r =>
        val share = r.getLong(1).toDouble / r.getLong(2)
        if (share <= hotShare) None
        else Some(r.getString(0) ->
          math.min(maxBuckets.toLong, math.ceil(2 * share / hotShare).toLong).toInt)
      }.toMap
  }
}
