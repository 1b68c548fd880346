package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd integer dot product over two `array<int>` columns
  * (the int8-quantized embedding codes of the quantized top-k scorer),
  * accumulated exactly in LONG.
  *
  * The composable formulation (`zip_with` + `aggregate`) allocates an
  * intermediate array per row and runs interpreted; like
  * [[CosineSimilarity]] this is a single fused loop inside whole-stage
  * codegen — the hot path of quantized similarity search, where the
  * whole point of int8 codes is streaming 4× more vectors per second.
  *
  * Products and the running sum are exact in 64-bit (|code| ≤ 127 →
  * each product ≤ 16129; 2^63 overflows only past ~5·10^14 elements),
  * so results are bit-identical to the HOF formulation.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // a null ELEMENT yields a null result (matching zip_with+aggregate),
  // so the expression is nullable even over non-null array columns
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int8_dot requires two array<int> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched lengths → null (the HOF zip_with-pads-null semantics);
    // a min-length truncation would return a plausible partial dot
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("anyNull")
      s"""
        int $n = $a.numElements();
        long $sum = 0L;
        boolean $bad = $n != $b.numElements();
        for (int $i = 0; $i < $n && !$bad; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
          else { $sum += (long) $a.getInt($i) * (long) $b.getInt($i); }
        }
        ${ev.isNull} = $bad;
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Int8Dot {
  /** The one SQL builder both install routes consume (arity-checked). */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"int8_dot expects 2 arguments (codesA, codesB), got ${exprs.length}")
    Int8Dot(exprs(0), exprs(1))
  }

  /** Register `int8_dot(a, b)` (registry + `expr(...)` is the supported
    * route to a custom expression on Spark 4's Column API). */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_dot", builder, "built-in")
}
