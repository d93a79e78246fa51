package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path (SURVEY §2
  * blocks D/E).
  *
  * The generic route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array per row pair and evaluates
  * interpreted. These expressions generate a tight primitive loop via
  * `doGenCode`, so the O(candidates × dim) similarity kernels stay
  * inside whole-stage codegen. Accumulation is the same
  * left-to-right double fold as the higher-order formulation, so
  * results are bit-identical and oracle checks are unaffected.
  *
  * Preference order per the engine's design rules: built-in functions
  * first; a native `Expression` (this) only where the built-ins can't
  * express the semantics efficiently; UDFs never on the hot path.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  // SQL users reach this through GraftExtensions, so the float32 input
  // contract must be an analysis error, not silent garbage from
  // reading 4-byte strides over wider elements
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // dimension mismatch is DATA corruption (a truncated dot returns a
  // plausible-but-wrong similarity) — fail fast at runtime, matching
  // the analysis-time strictness of checkInputDataTypes
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"dot_f32: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_f32: dimension mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double)$x.getFloat($i) * (double)$y.getFloat($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of a float array, double accumulation. */
case class NormF32(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_f32"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double)$x.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormF32 =
    copy(child = newChild)
}

/** All LSH band keys of one vector in ONE expression: band b's key has
  * bit j = sign of dot(v, planes(b*r+j)). The plane matrix rides the
  * generated class as a codegen reference object — NOT as b·r array
  * literals, which made the d5/s2 plans balloon (64-128 literal
  * expressions per branch; analysis + codegen cost dwarfed the actual
  * data work at bench scale). One tight nested primitive loop, same
  * left-to-right double dot fold as [[DotProductF32]], so band keys
  * are bit-identical to the compositional form (spec-pinned).
  */
case class BandKeysF32(child: Expression, planes: Array[Array[Float]], r: Int)
    extends UnaryExpression {
  private val nBands = planes.length / r
  require(planes.length == nBands * r, s"planes ${planes.length} not divisible by r=$r")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, false)
  override def prettyName: String = "lsh_band_keys_f32"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = planes(0).length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs $dim)")
    val keys = new Array[Int](nBands)
    var p = 0
    while (p < planes.length) {
      var acc = 0.0
      val plane = planes(p)
      var i = 0
      while (i < dim) { acc += v.getFloat(i).toDouble * plane(i); i += 1 }
      if (acc > 0) keys(p / r) |= 1 << (p % r)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val plane = ctx.freshName("plane")
      val dim = planes(0).length
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "lsh_band_keys_f32: dimension mismatch (" + $v.numElements() + " vs $dim)");
         |}
         |int[] $keys = new int[$nBands];
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double $acc = 0.0;
         |  float[] $plane = $planesRef[$p];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += (double)$v.getFloat($i) * (double)$plane[$i];
         |  }
         |  if ($acc > 0) $keys[$p / $r] |= 1 << ($p % $r);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BandKeysF32 =
    copy(child = newChild)
}

/** Exact ×1e6 integer quantization of a float vector (s3's
  * cross-engine-deterministic coordinate space): per element,
  * floor(double(x) · 1e6) — float→double widening and the product are
  * exact IEEE ops, so the result is bit-identical in DuckDB. */
case class QuantizeE6(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "quantize_e6"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.floor(v.getFloat(i).toDouble * 1e6).toLong; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (long) java.lang.Math.floor((double)$v.getFloat($i) * 1.0E6);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeE6 =
    copy(child = newChild)
}

/** s3's k-means assignment kernel: nearest centroid of a quantized
  * vector over the whole centroid matrix in ONE expression, result
  * packed as `sqdist · 16 + index` (k ≤ 16; sqdist ≤ 64·(2²¹)² ≪
  * 2⁵⁹, so the pack is lossless and the two halves come back out
  * with integer div/mod — builtins, no struct plumbing).
  *
  * The centroid matrix rides the generated class as a codegen
  * REFERENCE OBJECT — the same lesson [[BandKeysF32]] documents: k·dim
  * unrolled literal subtract-square terms made every Lloyd iteration
  * pay seconds of analysis + Janino compilation (~1 MB task
  * binaries), dwarfing the actual data work; and because the source
  * here is literal-free, every iteration reuses the SAME generated
  * class via the codegen cache. Ties break to the LOWEST index
  * (strict `<`), matching the oracle's `ORDER BY dist, cluster`. */
case class NearestCentE6(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {
  require(cents.nonEmpty && cents.length <= 16,
    s"nearest_cent_e6 supports 1..16 centroids, got ${cents.length}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_cent_e6"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = cents(0).length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs $dim)")
    var best = Long.MaxValue
    var bestIdx = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var acc = 0L
      var i = 0
      while (i < dim && acc < best) {
        val d = v.getLong(i) - cent(i); acc += d * d; i += 1
      }
      if (acc < best) { best = acc; bestIdx = c }
      c += 1
    }
    best * 16L + bestIdx
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = cents(0).length
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val cent = ctx.freshName("cent")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_cent_e6: dimension mismatch (" + $v.numElements() + " vs $dim)");
         |}
         |long $best = Long.MAX_VALUE;
         |int $bestIdx = 0;
         |for (int $c = 0; $c < ${cents.length}; $c++) {
         |  long[] $cent = $centsRef[$c];
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $dim && $acc < $best; $i++) {
         |    long $d = $v.getLong($i) - $cent[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $best) { $best = $acc; $bestIdx = $c; }
         |}
         |${ev.value} = $best * 16L + $bestIdx;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentE6 =
    copy(child = newChild)
}

/** s12's scalar-quantization (SQ8) encoder: a ×1e6 long vector →
  * per-dimension uint8 codes, `code_i = clamp(halfUp((e_i − min_i)·255
  * / span_i), 0, 255)` against the corpus-trained per-dim (min, span)
  * codebook. The codebook rides the generated class as a reference
  * object (the [[NearestCentE6]] lesson — literal-free source, one
  * generated class for the whole session). Half-up uses
  * `Math.floorDiv` so query values BELOW the corpus minimum (negative
  * numerator) round identically to the oracle's positive-mod floor
  * division before the clamp catches them. Output stays array<long>
  * so [[SumSqI64]]/[[DotI64]] consume codes directly. */
case class Sq8CodesE6(child: Expression, mins: Array[Long], spans: Array[Long])
    extends UnaryExpression {
  require(mins.length == spans.length && mins.nonEmpty, "codebook shape mismatch")
  require(spans.forall(_ > 0), "spans must be positive (guard zero-span dims upstream)")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "sq8_codes_e6"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = mins.length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs $dim)")
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val n = (v.getLong(i) - mins(i)) * 255L
      val q = Math.floorDiv(2L * n + spans(i), 2L * spans(i))
      out(i) = math.min(255L, math.max(0L, q))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "long[]")
    val spansRef = ctx.addReferenceObj("spans", spans, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = mins.length
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "sq8_codes_e6: dimension mismatch (" + $v.numElements() + " vs $dim)");
         |}
         |long[] $out = new long[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  long $n = ($v.getLong($i) - $minsRef[$i]) * 255L;
         |  long $q = java.lang.Math.floorDiv(2L * $n + $spansRef[$i], 2L * $spansRef[$i]);
         |  $out[$i] = java.lang.Math.min(255L, java.lang.Math.max(0L, $q));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8CodesE6 =
    copy(child = newChild)
}

/** Integer sum of squares of a long array (s3's exact ×1e6 norm
  * numerator — an order-free integer sum, deterministic under any
  * partitioning). */
case class SumSqI64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "sumsq_i64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { val x = v.getLong(i); acc += x * x; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      s"""
         |int $n = $v.numElements();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $v.getLong($i);
         |  ${ev.value} += $x * $x;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSqI64 =
    copy(child = newChild)
}

/** Integer dot product of two long arrays (×1e6-quantized space) —
  * the codegen'd kernel behind exact integer L2 distances at corpus
  * scale: ‖q−c‖² = Σq² + Σc² − 2·q·c with [[SumSqI64]] norms, every
  * term an order-free BIGINT (deterministic under any partitioning,
  * reproducible in DuckDB). Lengths must match (the embeddings-table
  * contract); a mismatch throws at evaluation like [[DotProductF32]]. */
case class DotI64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dot_i64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _),
            org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> arguments, got $other")
    }

  // dimension mismatch is a RUNTIME ERROR, matching DotProductF32: a
  // truncated partial dot returns a plausible-but-wrong distance that
  // silently reorders kNN results — fail loudly instead
  override def nullSafeEval(a: Any, b: Any): Any = {
    val u = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[ArrayData]
    if (u.numElements() != v.numElements())
      throw new IllegalArgumentException(
        s"dot_i64: dimension mismatch ${u.numElements()} vs ${v.numElements()}")
    val n = u.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += u.getLong(i) * v.getLong(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, v) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($u.numElements() != $v.numElements())
         |  throw new IllegalArgumentException("dot_i64: dimension mismatch "
         |    + $u.numElements() + " vs " + $v.numElements());
         |int $n = $u.numElements();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $u.getLong($i) * $v.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

/** s30's residual kernel: el − cents[argmin ‖el − c‖²] in ONE pass —
  * the IVF-PQ encode/train path needs the residual against the
  * vector's nearest coarse centroid, and recomputing the (≤16-way,
  * Dim-long) argmin inline is cheaper than materializing an index
  * column and joining the centroid back. Argmin semantics are
  * IDENTICAL to [[NearestCentE6]] (strict `<` keeps the FIRST =
  * lowest-position = lowest-cluster-id centroid on ties — the
  * oracle's ORDER BY dist, cluster), so the cell a vector is assigned
  * to and the centroid its residual subtracts can never disagree. */
case class ResidualE6(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {
  require(cents.nonEmpty && cents.length <= 16,
    s"residual_e6 supports 1..16 centroids, got ${cents.length}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "residual_e6"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
    }

  private def bestOf(v: ArrayData): Int = {
    val dim = cents(0).length
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs $dim)")
    var best = Long.MaxValue
    var bestIdx = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var acc = 0L
      var i = 0
      while (i < dim && acc < best) {
        val d = v.getLong(i) - cent(i); acc += d * d; i += 1
      }
      if (acc < best) { best = acc; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cent = cents(bestOf(v))
    val out = new Array[Long](cent.length)
    var i = 0
    while (i < cent.length) { out(i) = v.getLong(i) - cent(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = cents(0).length
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val cent = ctx.freshName("cent")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "residual_e6: dimension mismatch (" + $v.numElements() + " vs $dim)");
         |}
         |long $best = Long.MAX_VALUE;
         |int $bestIdx = 0;
         |for (int $c = 0; $c < ${cents.length}; $c++) {
         |  long[] $cent = $centsRef[$c];
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $dim && $acc < $best; $i++) {
         |    long $d = $v.getLong($i) - $cent[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $best) { $best = $acc; $bestIdx = $c; }
         |}
         |long[] $out = new long[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  $out[$i] = $v.getLong($i) - $centsRef[$bestIdx][$i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ResidualE6 =
    copy(child = newChild)
}

object VectorFunctions {
  /** Codegen'd float-array dot product as a Column. */
  def dotF32(a: Column, b: Column): Column =
    Bridge.column(DotProductF32(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd float-array euclidean norm as a Column. */
  def normF32(v: Column): Column =
    Bridge.column(NormF32(Bridge.expression(v)))

  /** Codegen'd all-band LSH keys as a Column. */
  def bandKeysF32(v: Column, planes: Array[Array[Float]], r: Int): Column =
    Bridge.column(BandKeysF32(Bridge.expression(v), planes, r))

  /** Codegen'd exact ×1e6 quantization as a Column. */
  def quantizeE6(v: Column): Column =
    Bridge.column(QuantizeE6(Bridge.expression(v)))

  /** Codegen'd packed nearest-centroid assignment as a Column. */
  def nearestCentE6(v: Column, cents: Array[Array[Long]]): Column =
    Bridge.column(NearestCentE6(Bridge.expression(v), cents))

  /** Codegen'd integer sum of squares as a Column. */
  def sumSqI64(v: Column): Column =
    Bridge.column(SumSqI64(Bridge.expression(v)))

  /** Codegen'd integer dot product as a Column. */
  def dotI64(a: Column, b: Column): Column =
    Bridge.column(DotI64(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd SQ8 encoding against a per-dim (min, span) codebook. */
  def sq8CodesE6(v: Column, mins: Array[Long], spans: Array[Long]): Column =
    Bridge.column(Sq8CodesE6(Bridge.expression(v), mins, spans))

  /** Codegen'd nearest-coarse-centroid residual (IVF-PQ encode). */
  def residualE6(v: Column, cents: Array[Array[Long]]): Column =
    Bridge.column(ResidualE6(Bridge.expression(v), cents))
}

/** SQL-surface registration (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * makes `dot_f32` / `norm_f32` available to pure-SQL users on any
  * session of a deployed cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // conf-gated interval-join rewrite (see graft.plans.BinnedRangeJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    // conf-gated naive-as-of rewrite (see graft.plans.AsofJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinRule)
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"dot_f32 takes 2 arguments, got ${children.length}")
        DotProductF32(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("norm_f32"),
      new ExpressionInfo(classOf[NormF32].getName, "norm_f32"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"norm_f32 takes 1 argument, got ${children.length}")
        NormF32(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("pair_counts"),
      new ExpressionInfo(classOf[PairCounts].getName, "pair_counts"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"pair_counts takes 1 argument, got ${children.length}")
        PairCounts(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("kmv_mins"),
      new ExpressionInfo(classOf[KmvMinsAgg].getName, "kmv_mins"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"kmv_mins takes 2 arguments, got ${children.length}")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_mins k must be an integer literal, got $other")
        }
        KmvMinsAgg(children.head, k)
      }))
  }
}
