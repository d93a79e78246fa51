package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Random-hyperplane LSH shared by d5 (banded near-dup pairs) and s2
  * (bucketed approximate kNN) — Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002; banding per
  * Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3.
  *
  * Plane weights are NOT drawn from an RNG: weight (p, i) is derived
  * from md5("plane:p:i") by the same integer formula in Scala (becoming
  * plan-time `array<float>` literals) and in DuckDB SQL (a compact
  * generated CTE). That makes every bucket assignment — and therefore
  * every LSH candidate set — reproducible across engines, so the
  * bucketed operators get REAL hash-checked oracles instead of
  * rows-only waivers: the oracle replicates candidate generation
  * exactly rather than needing recall to be 1.
  *
  * The sign computation runs through the codegen'd
  * [[graft.functions.DotProductF32]] kernel against literal planes —
  * never the interpreted `aggregate(zip_with(...))` higher-order form
  * (measured ~20× slower, SURVEY §5).
  */
object Lsh {

  /** 2^59 — md5-derived 60-bit value over this lands in [0, 2). */
  private val ScaleSql = "576460752303423488.0"
  private val Scale = ScaleSql.toDouble

  /** Deterministic plane weight in [-1, 1): 15 hex chars of
    * md5("plane:p:i") as a 60-bit int, scaled. Float so the Spark
    * literal and the oracle's CAST(... AS FLOAT) agree bit-for-bit
    * (both sides then multiply in double precision). `i` is 1-based to
    * line up with DuckDB's generate_subscripts. */
  def planeWeight(p: Int, i: Int): Float =
    (graft.functions.DetHash.md5Long60(s"plane:$p:$i").toDouble / Scale - 1.0).toFloat

  /** Plane p as a float array of length `dim`. */
  def plane(p: Int, dim: Int): Array[Float] =
    (1 to dim).map(i => planeWeight(p, i)).toArray

  /** Sign bit of dot(v, plane_p): codegen'd dot against an
    * `array<float>` literal. */
  def bit(v: Column, p: Int, dim: Int): Column =
    when(VectorFunctions.dotF32(v, typedlit(plane(p, dim))) > 0d, 1).otherwise(0)

  /** r-bit band key for band b (planes b*r .. b*r+r-1), an INT whose
    * bit j is the sign of plane b*r+j. */
  def bandKey(v: Column, b: Int, r: Int, dim: Int): Column =
    (0 until r).map(j => bit(v, b * r + j, dim) * lit(1 << j)).reduce(_ + _)

  /** All band keys as one array<int> column (posexplode → bucket
    * join). ONE native expression carrying the plane matrix as a
    * codegen reference ([[graft.functions.BandKeysF32]]) — building
    * bands·r literal-array dot expressions instead made analysis +
    * codegen the dominant cost of the d5/s2 plans. Bit-identical to
    * the compositional [[bandKey]] form (spec-pinned). */
  def bandKeys(v: Column, bands: Int, r: Int, dim: Int): Column =
    VectorFunctions.bandKeysF32(v,
      (0 until bands * r).map(p => plane(p, dim)).toArray, r)

  /** DuckDB CTE bodies replicating the plane/band computation. Expects
    * a CTE `u(vec_id, v, i)` = unnested double embeddings with 1-based
    * subscripts (the s1Sql shape). Yields `bands(vec_id, band_idx,
    * band_key)` — band_idx = p / r, matching [[bandKeys]] order.
    *
    * The dot is an ORDERED aggregate (`ORDER BY u.i`): DuckDB then
    * accumulates doubles ascending-index exactly like the Spark
    * kernels' left-to-right fold, so a near-zero dot cannot flip a
    * plane sign between engines (an unordered FP sum varies with
    * DuckDB's parallel-agg combine order — latent oracle flakiness). */
  def bandsSqlCtes(nPlanes: Int, r: Int, dim: Int): String =
    s"""planes AS (
       |  SELECT p, i,
       |    CAST(CAST(('0x' || substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)
       |         / $ScaleSql - 1.0 AS FLOAT) AS w
       |  FROM range($nPlanes) tp(p), range(1, ${dim + 1}) ti(i)),
       |dots AS (
       |  SELECT u.vec_id, planes.p, sum(u.v * CAST(planes.w AS DOUBLE) ORDER BY u.i) AS d
       |  FROM u JOIN planes ON u.i = planes.i
       |  GROUP BY u.vec_id, planes.p),
       |bands AS MATERIALIZED (
       |  SELECT vec_id, p // $r AS band_idx,
       |         CAST(sum(CASE WHEN d > 0 THEN 1 << (p % $r) ELSE 0 END) AS INTEGER) AS band_key
       |  FROM dots GROUP BY vec_id, p // $r)""".stripMargin
}
