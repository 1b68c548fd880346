package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket ids for an `array<float>` embedding —
  * one value per hash table — as a native codegen'd expression.
  *
  * The composable formulation (tables × planes × dim `element_at` terms)
  * builds a ~1000-node expression tree that overflows whole-stage
  * codegen's method budget and falls back to interpretation; here the
  * plane matrix is precomputed once at plan time (deterministic: each
  * component derives from xxhash64(plane, dim), mapped into [-1, 1))
  * and evaluation is one compiled JVM method with a tight dims×planes
  * loop (doGenCode emits a call into that method via a reference
  * object — the win is the precomputed matrix and single dispatch, not
  * inline source generation).
  */
case class LshBuckets(child: Expression, tables: Int, planesPerTable: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets requires array<float>, got ${other.simpleString}")
    }

  /** plane p (global index), component j — same for eval and codegen. */
  @transient private lazy val planeCount = tables * planesPerTable

  private def planeComp(p: Int, j: Int): Double = LshBuckets.planeComponent(p, j)

  /** Dense [planeCount][dim-on-demand] matrix is too big to bake fully;
    * planes are materialized up to the first seen dimensionality. */
  @transient private lazy val planesFlat: Array[Double] = {
    val dim = LshBuckets.BakedDim
    Array.tabulate(planeCount * dim)(i => planeComp(i / dim, i % dim))
  }
  private lazy val bakedDim = LshBuckets.BakedDim

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < planesPerTable) {
        val p = t * planesPerTable + b
        var dot = 0.0
        var j = 0
        while (j < n) {
          val comp = if (j < bakedDim) planesFlat(p * bakedDim + j) else planeComp(p, j)
          dot += a.getFloat(j).toDouble * comp
          j += 1
        }
        if (dot >= 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.nullSafeEval($a);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshBuckets {
  /** Fixture dimensionality the plane matrix is pre-baked for; larger
    * vectors extend hash-on-demand in eval. The q52 oracle bakes plane
    * literals for exactly this many dimensions — both must come from
    * this ONE constant or they silently diverge on re-dimensioned
    * corpora. */
  val BakedDim = 64

  /** Hyperplane component (plane p, dimension j): xxhash64-derived,
    * mapped into [-1, 1). Every value is a dyadic rational (m/2^19 − 1
    * with m < 2^20), so its decimal expansion is FINITE and an external
    * SQL engine given the printed literal reconstructs the identical
    * double — which is what lets the q52 oracle replay the whole LSH
    * pipeline with the planes baked in as literals. */
  def planeComponent(p: Int, j: Int): Double = {
    val h = XXH64.hashLong(j.toLong, p.toLong) // seed = plane index
    val m = ((h % (1L << 20)) + (1L << 20)) % (1L << 20)
    m.toDouble / (1L << 19).toDouble - 1.0
  }

  /** SQL builder for a fixed (tables, planes) configuration — both
    * install routes (register() and GraftExtensions) consume this, so
    * arity validation and the default geometry live in one place. */
  def builder(tables: Int = 4, planesPerTable: Int = 4): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1,
        s"lsh_buckets expects 1 argument (vec), got ${exprs.length}; " +
          "table/plane counts are fixed at registration")
      LshBuckets(exprs.head, tables, planesPerTable)
    }

  /** Register `lsh_buckets(vec)` (4 tables × 4 planes). */
  def register(s: SparkSession, tables: Int = 4, planesPerTable: Int = 4): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_buckets", builder(tables, planesPerTable), "built-in")
}
