package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The composable formulation (`zip_with` + `aggregate`) allocates an
  * intermediate array and walks it twice per row; this expression is a
  * single fused loop emitted into whole-stage codegen — the hot path of
  * brute-force similarity search at 100 TB.
  *
  * Accumulation is a strict left-to-right double fold, IDENTICAL to both
  * the higher-order-function formulation and DuckDB's list_dot_product
  * loop, so results stay bit-for-bit comparable across engines.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // a null ELEMENT yields a null result (matching the HOF formulation),
  // so the expression is nullable even over non-null array columns
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // mismatched lengths → null (the HOF zip_with-pads-null semantics);
    // a min-length truncation would return a plausible partial score
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("anyNull")
      s"""
        int $n = $a.numElements();
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        boolean $bad = $n != $b.numElements();
        for (int $i = 0; $i < $n && !$bad; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
          else {
            double $x = (double) $a.getFloat($i);
            double $y = (double) $b.getFloat($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
        }
        ${ev.isNull} = $bad;
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** The one SQL builder both install routes (register() and
    * GraftExtensions) consume — arity is validated here so a SQL user
    * gets a clear error, not an IndexOutOfBoundsException. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"cosine_sim expects 2 arguments (vecA, vecB), got ${exprs.length}")
    CosineSimilarity(exprs(0), exprs(1))
  }

  /** Register `cosine_sim(a, b)` in the session's function registry
    * (Spark 4's Column API no longer exposes raw expressions, so the
    * registry + `expr("cosine_sim(…)")` is the supported route). */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", builder, "built-in")
}
