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

/** One-pass character K-GRAM / window generator: emits (pos, g) rows —
  * 1-based code-point position, k-code-point slice starting there —
  * stepping `stride` positions at a time, exactly
  * `substring(text, pos, k)`'s semantics. `stride = 1, partial =
  * false` is the sliding-gram shape (d19's ExactSubstr cover);
  * `stride = k, partial = true` is the TILING shape (mm11's 256-byte
  * frames, mm12's VAD windows — the trailing short window included).
  *
  * Exists because the generic route — `explode(sequence(...))` then
  * `substr(text, pos, k)` — is QUADRATIC in document length:
  * UTF8String.substring seeks its code-point offsets from the string
  * START (O(pos) per call), and the exploded row carries the whole
  * text through the pipeline (one full-string copy per position). A
  * 1 MB document costs ~10 minutes that way (measured — the d19
  * hot-gram stress); this walk computes all code-point offsets once
  * and emits each slice as a direct byte copy: O(chars·k/stride)
  * total, the same document in well under a second. Truncated
  * trailing multi-byte sequences clamp to the buffer (the
  * [[PairCounts]] crawl-bytes rule).
  *
  * Eval-only ([[CodegenFallback]]): one call per DOCUMENT streaming
  * its rows through GenerateExec — the per-byte loop is already tight
  * Java. */
case class CharGrams(child: Expression, k: Int, stride: Int = 1,
                     partial: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with CodegenFallback {
  require(k >= 1, s"gram width must be >= 1, got $k")
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def prettyName: String = "char_grams"

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("g", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_grams needs a string column, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
  : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      // code-point start offsets, computed ONCE (offsets(n) = end)
      val offs = new java.util.ArrayList[Integer](bytes.length + 1)
      var i = 0
      while (i < bytes.length) {
        offs.add(i)
        i += UTF8String.numBytesForFirstByte(bytes(i))
      }
      offs.add(bytes.length)
      val n = offs.size - 1
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        private var p = 0
        override def hasNext: Boolean =
          if (partial) p < n else p <= n - k
        override def next(): org.apache.spark.sql.catalyst.InternalRow = {
          val s = offs.get(p)
          // clamp: a truncated trailing sequence may push the last
          // offset past the buffer on malformed crawl bytes, and a
          // partial trailing window ends at the string
          val e = math.min(offs.get(math.min(p + k, n)), bytes.length)
          val r = org.apache.spark.sql.catalyst.InternalRow(
            (p + 1).toLong, UTF8String.fromBytes(bytes, s, e - s))
          p += stride
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object TextFunctions {
  /** Per-document adjacent-character-pair histogram as a Column. */
  def pairCounts(text: Column): Column =
    Bridge.column(PairCounts(Bridge.expression(text)))

  /** One-pass (pos, g) character k-gram / window generator as a
    * Column — select it like `posexplode` (it contributes the two
    * columns). `stride = k, partial = true` tiles the document into
    * consecutive windows including the short trailing one. */
  def charGrams(text: Column, k: Int, stride: Int = 1,
                partial: Boolean = false): Column =
    Bridge.column(CharGrams(Bridge.expression(text), k, stride, partial))

  /** Per-document segment code-point sums as a Column (mm7's decode). */
  def segCodeSums(text: Column, segs: Int): Column =
    Bridge.column(SegCodeSums(Bridge.expression(text), segs))
}
