package graft.sources

import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Or => V2Or, Predicate}
import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String

/** V2 `Predicate` → V1 `Filter` bridge for the KV scan builder.
  *
  * The scan negotiates pushdown through `SupportsPushDownV2Filters`
  * (Spark consults the v1 `SupportsPushDownFilters` interface FIRST when
  * both are implemented, so "v2 alongside v1" would leave the v2 path
  * dead code — the builder therefore implements ONLY v2 and translates
  * here). Internally everything still runs on v1 `Filter`s:
  * [[FilterEval]] decides pushability and evaluates rows, and
  * `SupportsRuntimeFiltering` hands the scan v1 filters anyway.
  *
  * Untranslatable predicates map to None → residual (Spark re-evaluates
  * above the scan), never to a silently-wrong filter.
  */
object V2Filters {

  /** Catalyst-internal literal → the external domain `FilterEval.canon`
    * expects. Internal temporal values (micros/days) pass through —
    * canon treats raw longs/ints as already-canonical. Internal Decimal
    * must become java.math.BigDecimal (canon/cmp match on it). */
  private def externalize(v: Any): Any = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case other => other
  }

  private def fieldName(e: V2Expression): Option[String] = e match {
    case r: NamedReference if r.fieldNames().length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  /** (attribute, literal) from a binary comparison's children, tolerating
    * either operand order; `flipped` = literal was on the left. */
  private def colLit(children: Array[V2Expression]): Option[(String, Any, Boolean)] =
    children match {
      case Array(r: NamedReference, l: Literal[_]) =>
        fieldName(r).map(n => (n, externalize(l.value()), false))
      case Array(l: Literal[_], r: NamedReference) =>
        fieldName(r).map(n => (n, externalize(l.value()), true))
      case _ => None
    }

  private def stringLit(v: Any): Option[String] = v match {
    case s: UTF8String => Some(s.toString)
    case s: String => Some(s)
    case _ => None
  }

  def toV1(p: Predicate): Option[Filter] = p match {
    case a: V2And =>
      for (l <- toV1(a.left()); r <- toV1(a.right())) yield And(l, r)
    case o: V2Or =>
      for (l <- toV1(o.left()); r <- toV1(o.right())) yield Or(l, r)
    case n: V2Not => toV1(n.child()).map(Not.apply)
    case _ => (p.name(), p.children()) match {
      case ("=", ch) => colLit(ch).map { case (n, v, _) => EqualTo(n, v) }
      // Catalyst emits a!=b as the dedicated "<>" predicate, not NOT(=)
      case ("<>", ch) => colLit(ch).map { case (n, v, _) => Not(EqualTo(n, v)) }
      case ("<=>", ch) => colLit(ch).map { case (n, v, _) => EqualNullSafe(n, v) }
      case ("<", ch) => colLit(ch).map {
        case (n, v, false) => LessThan(n, v)
        case (n, v, true)  => GreaterThan(n, v)
      }
      case ("<=", ch) => colLit(ch).map {
        case (n, v, false) => LessThanOrEqual(n, v)
        case (n, v, true)  => GreaterThanOrEqual(n, v)
      }
      case (">", ch) => colLit(ch).map {
        case (n, v, false) => GreaterThan(n, v)
        case (n, v, true)  => LessThan(n, v)
      }
      case (">=", ch) => colLit(ch).map {
        case (n, v, false) => GreaterThanOrEqual(n, v)
        case (n, v, true)  => LessThanOrEqual(n, v)
      }
      case ("IN", ch) if ch.length >= 2 =>
        for {
          n <- fieldName(ch(0))
          vs <- Some(ch.drop(1)).filter(_.forall(_.isInstanceOf[Literal[_]]))
        } yield In(n, vs.map(l => externalize(l.asInstanceOf[Literal[_]].value)))
      case ("IS_NULL", Array(c)) => fieldName(c).map(IsNull.apply)
      case ("IS_NOT_NULL", Array(c)) => fieldName(c).map(IsNotNull.apply)
      case ("STARTS_WITH", Array(c, l: Literal[_])) =>
        for (n <- fieldName(c); s <- stringLit(l.value())) yield StringStartsWith(n, s)
      case ("ENDS_WITH", Array(c, l: Literal[_])) =>
        for (n <- fieldName(c); s <- stringLit(l.value())) yield StringEndsWith(n, s)
      case ("CONTAINS", Array(c, l: Literal[_])) =>
        for (n <- fieldName(c); s <- stringLit(l.value())) yield StringContains(n, s)
      case ("ALWAYS_TRUE", _) => Some(AlwaysTrue)
      case ("ALWAYS_FALSE", _) => Some(AlwaysFalse)
      case _ => None
    }
  }
}
