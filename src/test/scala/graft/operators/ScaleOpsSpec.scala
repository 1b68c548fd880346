package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-technique demonstrations: salted skew joins and bucketed
  * (pre-shuffled) co-located joins. */
class ScaleOpsSpec extends SparkSpec {

  test("salted join equals plain join on a skewed dataset") {
    import spark.implicits._
    // 90% of rows hit key 1 (hot), the rest spread over 1000 keys
    val big = (1 to 20000).map { i =>
      val k = if (i % 10 != 0) 1L else (i % 1000).toLong
      (k, s"row$i")
    }.toDF("k", "payload")
    val small = (0L to 1000L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("fully duplicate rows of a hot key occupy more than one salt bucket") {
    import spark.implicits._
    // every row is IDENTICAL — a content-only salt hash would put all of
    // them in a single bucket, recreating the skew the salt should break
    val dup = (1 to 10000).map(_ => (1L, "dup")).toDF("k", "payload")
      .repartition(8)
    val buckets = dup.withColumn("_salt", SkewJoin.saltExpr(dup, 8))
      .select("_salt").distinct().count()
    assert(buckets > 1, s"identical hot-key rows collapsed into $buckets salt bucket(s)")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import spark.implicits._
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val a = (1L to 10000L).map(k => (k, k * 2)).toDF("k", "va")
    val b = (1L to 10000L).map(k => (k, k * 3)).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable(s"$db.bucketed_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable(s"$db.bucketed_b")
    val joined = spark.table(s"$db.bucketed_a")
      .join(spark.table(s"$db.bucketed_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 10000L)
  }
}
