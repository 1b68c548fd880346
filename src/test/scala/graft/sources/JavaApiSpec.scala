package graft.sources

import graft.SparkSpec

/** Drives the plain-Java API twin of the reference's Java test. */
class JavaApiSpec extends SparkSpec {
  test("connector works from the Java API (reference JavaDatasourceTest shape)") {
    graft.JavaKvApi.run(spark)
  }
}
