package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic cross-engine hashing: the SAME 60-bit integer from a
  * string in Scala (plan-time constants), in a Spark column (codegen'd
  * md5+conv), and in DuckDB SQL — so sketch operators (MinHash,
  * SimHash, hyperplane LSH) can be reproduced EXACTLY by the
  * correctness oracle instead of settling for rows-only checks.
  *
  * 60 bits = 15 hex chars of md5: always non-negative, fits BIGINT in
  * both engines with headroom for the affine universal-hash arithmetic
  * below (Carter–Wegman (a·x+b) mod p, the classic MinHash slot-hash
  * family, MMDS ch. 3): with x reduced mod 2³¹−1 and a < 2³⁰,
  * a·x+b < 2⁶²: exact in 64-bit integers everywhere — no wrapping in
  * Spark, no overflow error in DuckDB.
  */
object DetHash {

  /** 2^61 − 1 (Mersenne prime) — modulus for slot-hash values. */
  val P61 = 2305843009213693951L

  /** 2^31 − 1 (Mersenne prime) — domain reduction for x. */
  val M31 = 2147483647L

  /** 2^30 − 1 — range cap for the multiplier `a` (then +1, so a ≥ 1). */
  val M30 = 1073741823L

  /** Scala-side value: first 15 hex chars of md5(s) as a long. */
  def md5Long60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Column-side value: identical to [[md5Long60]] for the same
    * string. conv/substring/md5 are all codegen'd. */
  def md5Long60Col(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB-side value: identical again. `expr` is a VARCHAR SQL
    * expression. */
  def sql60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** MinHash slot multiplier/offset j — same derivation on all
    * engines: a_j = md5₆₀("mh:a:j") mod (2³⁰−1) + 1, b_j =
    * md5₆₀("mh:b:j") mod (2⁶¹−1). */
  def slotA(j: Int): Long = md5Long60(s"mh:a:$j") % M30 + 1
  def slotB(j: Int): Long = md5Long60(s"mh:b:$j") % P61
}
