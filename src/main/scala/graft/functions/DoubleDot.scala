package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<double>` columns — the
  * PQ hot path (subvector×codeword affinities in the encode, ADC
  * reconstruction scoring in the probe). The composable `zip_with` +
  * `aggregate` formulation allocates an intermediate array per row and
  * runs interpreted; this is one fused loop inside whole-stage codegen,
  * the same treatment [[CosineSimilarity]] gives the float hot paths.
  *
  * Accumulation is a strict left-to-right double fold, identical to the
  * HOF formulation and DuckDB's list_dot_product, so PQ codes, ADC
  * ranks, and every downstream hash stay bit-for-bit comparable across
  * engines (asserted in ScalaTest).
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // a null ELEMENT yields a null result (matching the HOF formulation)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_d requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched lengths → null, matching the HOF formulation exactly:
    // zip_with pads the shorter array with nulls and acc + null is null.
    // A silent min-length truncation would hand a caller with wrong
    // dims a plausible-looking partial dot instead.
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("anyNull")
      s"""
        int $n = $a.numElements();
        double $dot = 0.0;
        boolean $bad = $n != $b.numElements();
        for (int $i = 0; $i < $n && !$bad; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
          else { $dot += $a.getDouble($i) * $b.getDouble($i); }
        }
        ${ev.isNull} = $bad;
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DoubleDot {
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"dot_d expects 2 arguments (vecA, vecB), got ${exprs.length}")
    DoubleDot(exprs(0), exprs(1))
  }

  /** Register `dot_d(a, b)` in the session's function registry. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_d", builder, "built-in")
}
