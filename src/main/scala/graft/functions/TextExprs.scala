package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the BPE hot path (SURVEY §2 block F).
  *
  * [[PairCounts]] collapses a document to its adjacent-CHARACTER-pair
  * histogram in one pass. The generic route — explode an array of
  * `substring(text, i, 2)` slices and let the partial aggregate
  * combine — materializes one ROW PER CHARACTER POSITION through the
  * operator pipeline (~corpus-chars rows per BPE round); this emits
  * one map per document (~distinct-pairs entries), so the exploded
  * aggregation input shrinks by the per-doc repetition factor. Pair
  * identity is Unicode CODE POINTS exactly like `substring` /
  * `length` (UTF-8 sequence starts), so counts are bit-identical to
  * the exploded formulation and the DuckDB oracle.
  *
  * Eval-only ([[CodegenFallback]]): it runs once per DOCUMENT (not
  * per pair), which is off the per-row hot path the codegen rule
  * guards; the per-byte loop is already tight Java. */
case class PairCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "pair_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pair_counts needs a string column, got $other")
    }

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < bytes.length) {
      val l1 = UTF8String.numBytesForFirstByte(bytes(i))
      val j = i + l1
      if (j < bytes.length) {
        // clamp to the array: crawl ingest lands unvalidated bytes, and
        // a TRUNCATED trailing multi-byte sequence would otherwise make
        // the pair view read past the end (nondeterministic garbage
        // through the unsafe copy, not a clean error)
        val l2 = UTF8String.numBytesForFirstByte(bytes(j))
        val end = math.min(j + l2, bytes.length)
        val pair = UTF8String.fromBytes(bytes, i, end - i)
        counts.merge(pair, 1L, (x, y) => x + y)
      }
      i = j
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var k = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); keys(k) = e.getKey; vals(k) = e.getValue; k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(newChild: Expression): PairCounts =
    copy(child = newChild)
}

/** Per-document SEGMENT code-point sums — the mm7 pHash gray
  * signature in one pass: the document's code points are tiled into
  * `segs` equal position-ranges (seg = ⌊pos·segs/n⌋, exactly the
  * exploded formulation's bucketing) and each segment's code points
  * are summed. The generic route — posexplode(split(text, "")) +
  * TWO hash aggregations — pushes one ROW PER CHARACTER through an
  * exchange (Θ(corpus chars), ×10 the document volume); this emits
  * one `segs`-long array per document, deleting the Generate and both
  * aggregations from the plan. Values are bit-identical: `split`'s
  * chars are code points (Java regex splits on code-point
  * boundaries) and `ascii()` is the code point, which is what this
  * walk sums; segment COUNTS are recovered arithmetically from the
  * length (c_j = ⌈(j+1)n/segs⌉ − ⌈jn/segs⌉ — the bucket sizes of the
  * floor rule).
  *
  * Eval-only ([[CodegenFallback]]) by the [[PairCounts]] argument:
  * one call per DOCUMENT, tight per-char Java inside. */
case class SegCodeSums(child: Expression, segs: Int)
    extends UnaryExpression with CodegenFallback {
  require(segs >= 1, s"segs must be >= 1, got $segs")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "seg_code_sums"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"seg_code_sums needs a string column, got $other")
    }

  override def nullSafeEval(a: Any): Any = {
    val u = a.asInstanceOf[UTF8String]
    val s = u.toString
    val n = u.numChars().toLong // = length(text): code-point count
    val sums = new Array[Long](segs)
    var i = 0
    var pos = 0L
    while (i < s.length && n > 0) {
      val cp = s.codePointAt(i)
      // clamp: on MALFORMED UTF-8, toString substitutes replacement
      // chars and its code-point walk can disagree with numChars —
      // crawl bytes must degrade to a skewed last segment, not an
      // ArrayIndexOutOfBounds (the PairCounts truncated-sequence rule)
      sums(math.min(((pos * segs) / n).toInt, segs - 1)) += cp
      pos += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(sums)
  }

  override protected def withNewChildInternal(newChild: Expression): SegCodeSums =
    copy(child = newChild)
}

object TextFunctions {
  /** Per-document adjacent-character-pair histogram as a Column. */
  def pairCounts(text: Column): Column =
    Bridge.column(PairCounts(Bridge.expression(text)))

  /** Per-document segment code-point sums as a Column (mm7's decode). */
  def segCodeSums(text: Column, segs: Int): Column =
    Bridge.column(SegCodeSums(Bridge.expression(text), segs))
}
