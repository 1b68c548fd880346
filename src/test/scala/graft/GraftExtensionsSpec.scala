package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The config-only install route: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves the native
  * functions with no programmatic register() call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions installs the native functions") {
    val base = SparkSpec.session // ensures a SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is read from the SparkContext conf at
      // startup, which a test sharing one JVM-wide context cannot
      // change; .withExtensions drives the IDENTICAL injection path
      // (the config string is just Utils.loadExtensions + this call)
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base, "builder must mint a fresh session to apply extensions")
      import s.implicits._
      val row = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(3, 4), Array(2, 10)))
        .toDF("a", "b", "qa", "qb")
        .select(
          expr("cosine_sim(a, b)").as("cos"),
          expr("int8_dot(qa, qb)").as("dot"),
          size(expr("lsh_buckets(a)")).as("n_buckets"))
        .head()
      assert(row.getAs[Double]("cos") == 1.0)
      assert(row.getAs[Long]("dot") == 3L * 2L + 4L * 10L)
      assert(row.getAs[Int]("n_buckets") == 4, "4 LSH tables by default")
      // DESCRIBE surface works too (ExpressionInfo wired)
      assert(s.sql("DESCRIBE FUNCTION cosine_sim").collect()
        .exists(_.getString(0).contains("cosine_sim")))
      // parity with the programmatic route on the base session
      functions.CosineSimilarity.register(base)
      val viaRegister = {
        import base.implicits._
        Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
          .select(expr("cosine_sim(a, b)")).head().getDouble(0)
      }
      val viaExtensions = {
        Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
          .select(expr("cosine_sim(a, b)")).head().getDouble(0)
      }
      assert(viaRegister == viaExtensions, "both install routes run the same expression")
      // arity misuse fails with a clear message, not an index error
      val tooFew = intercept[Exception] {
        Seq(Tuple1(Array(1.0f))).toDF("a").select(expr("cosine_sim(a)")).head()
      }
      assert(tooFew.getMessage.contains("expects 2 arguments"), tooFew.getMessage)
      val tooMany = intercept[Exception] {
        Seq(Tuple1(Array(1.0f))).toDF("a").select(expr("lsh_buckets(a, 8)")).head()
      }
      assert(tooMany.getMessage.contains("expects 1 argument"), tooMany.getMessage)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
