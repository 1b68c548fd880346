package org.apache.spark.graft

import org.apache.spark.SparkArithmeticException

/** Access shim, the one file living under `org.apache.spark`:
  * [[SparkArithmeticException]] is `private[spark]` at the Scala level
  * (only its bytecode is public), but the pushed-aggregate reader must
  * raise the SAME error class (`ARITHMETIC_OVERFLOW`) and exception
  * type (an `ArithmeticException` subclass implementing
  * `SparkThrowable`) as Spark's own checked Sum, so callers matching on
  * either see no difference between the pushed and unpushed plans.
  * Mirrors `QueryExecutionErrors.arithmeticOverflowError`, which is
  * `private[sql]` for the same reason.
  */
object GraftSparkErrors {
  def arithmeticOverflow(message: String, hint: String): ArithmeticException = {
    val alternative =
      if (hint.nonEmpty) s" Use '$hint' to tolerate overflow and return NULL instead."
      else ""
    new SparkArithmeticException(
      "ARITHMETIC_OVERFLOW",
      Map("message" -> message, "alternative" -> alternative,
        "config" -> "\"spark.sql.ansi.enabled\""),
      Array.empty, "")
  }
}
