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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
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
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
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

object VectorFunctions {
  /** Codegen'd float-array dot product as a Column. */
  def dotF32(a: Column, b: Column): Column =
    Bridge.column(DotProductF32(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd float-array euclidean norm as a Column. */
  def normF32(v: Column): Column =
    Bridge.column(NormF32(Bridge.expression(v)))
}

/** SQL-surface registration (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * makes `dot_f32` / `norm_f32` available to pure-SQL users on any
  * session of a deployed cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
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
  }
}
