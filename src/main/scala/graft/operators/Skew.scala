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
}
