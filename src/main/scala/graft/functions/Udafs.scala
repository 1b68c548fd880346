package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.10 — ABSENT in the reference; the
  * rebuild provides a real `Aggregator`).
  *
  * WeightedAvg aggregates exact integer "cents" so the result is
  * order-independent and cross-engine reproducible: the final value is
  * one IEEE division of two exactly-summed longs.
  */
object WeightedAvg extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (b._1 + a._1, b._2 + a._2)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) Double.NaN else b._1.toDouble / b._2.toDouble
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
