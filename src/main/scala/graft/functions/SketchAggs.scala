package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV ("k minimum values" / bottom-k theta) distinct-count sketch as
  * a native Catalyst aggregate (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002; Beyer et al., "On synopses
  * for distinct-value estimation under multiset operations", SIGMOD
  * 2007).
  *
  * State is the k smallest DISTINCT hash values seen — bounded at k
  * longs per group per partition, so partial aggregation map-side
  * combines a 100 TB scan down to (groups × k) longs before the only
  * shuffle; the estimator (k−1)/kth-min-normalized needs exactly this
  * state. That bounded-state property is why this is a
  * TypedImperativeAggregate and not a distinct-then-window relational
  * plan: the relational form's first shuffle is the full (group, hash)
  * set — the thing a sketch exists to avoid. (No codegen: object-hash
  * aggregation, like Spark's own approx sketches; the hash input
  * column IS codegen'd upstream.)
  *
  * Returns the kept values ascending (size < k ⟺ the group's true
  * distinct count = size: the sketch is EXACT below k). Estimation is
  * left to plain column arithmetic downstream so the oracle can
  * reproduce it — the sketch itself is deterministic given a
  * deterministic hash ([[DetHash.md5Long60Col]]), hence hash-checkable
  * cross-engine, unlike approx_count_distinct's HLL++.
  */
case class KmvMinsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv_mins needs k >= 2, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // bounded insert: skip values already >= current kth min
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kmv_mins"
}

object SketchFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** The k smallest distinct values of a LONG hash column, ascending —
    * the KMV sketch state, as an aggregate Column. */
  def kmvMins(c: Column, k: Int): Column =
    Bridge.column(KmvMinsAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Codegen'd membership probe of a driver-built
    * `org.apache.spark.util.sketch.BloomFilter` — Spark's own
    * `BloomFilterMightContain` (the expression behind injected runtime
    * filters) over the serialized bits as a binary literal, probing
    * `xxhash64(value)`. The filter MUST therefore have been built over
    * `xxhash64(value)` longs (`putLong`/`mightContainLong` are the
    * consistent pair); the extra 64-bit hash layer can only turn a
    * miss into a spurious hit — the same one-sided error as the
    * filter itself. Replaces the per-row Scala-UDF probe: the whole
    * predicate stays inside WholeStageCodegen, and the filter is
    * deserialized once per task, not boxed per row. NULL values
    * probe as false (a null never matched the old join either). */
  def bloomMightContainHashed(bf: org.apache.spark.util.sketch.BloomFilter,
                              value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    val os = new java.io.ByteArrayOutputStream()
    bf.writeTo(os)
    val probe = Bridge.column(BloomFilterMightContain(
      // seed 42 = the xxhash64() SQL function's default, which the
      // build side uses
      Literal(os.toByteArray), XxHash64(Seq(Bridge.expression(value)), 42L)))
    org.apache.spark.sql.functions.when(value.isNotNull, probe)
      .otherwise(org.apache.spark.sql.functions.lit(false))
  }
}
