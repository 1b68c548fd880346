package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** SQL time travel through the catalog: `VERSION AS OF` pins a manifest
  * commit, `TIMESTAMP AS OF` resolves a wall-clock instant through the
  * stamped manifest chain. Built on the same snapshot machinery as the
  * `asOfVersion` read option (retain-mode rewrites + vacuum grace). */
class KvTimeTravelSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-tt-wh").toString

  private lazy val ready: Unit = {
    spark.conf.set("spark.sql.catalog.tt", classOf[KvSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.tt.warehouse", wh)
  }
  private def sql(q: String) = { ready; spark.sql(q) }

  test("VERSION AS OF replays each manifest commit; TIMESTAMP AS OF maps instants") {
    sql("CREATE TABLE tt.default.hist (k BIGINT, v STRING) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO tt.default.hist VALUES (1, 'a'), (2, 'b')") // version 1
    Thread.sleep(5)
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    sql("INSERT INTO tt.default.hist VALUES (3, 'c')")           // version 2
    sql("DELETE FROM tt.default.hist WHERE k = 1")               // version 3

    assert(sql("SELECT k FROM tt.default.hist").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(2L, 3L))
    assert(sql("SELECT k FROM tt.default.hist VERSION AS OF 1")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(sql("SELECT k FROM tt.default.hist VERSION AS OF 2")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // an explicit asOfVersion option on a pinned table still wins is a
    // non-SQL path; here: timestamp between v1 and v2 resolves to v1
    assert(sql(s"SELECT k FROM tt.default.hist TIMESTAMP AS OF timestamp_millis($afterV1)")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // a timestamp after the last commit resolves to the current version
    assert(sql("SELECT k FROM tt.default.hist TIMESTAMP AS OF current_timestamp()")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("unavailable version and pre-creation timestamp fail at analysis") {
    sql("CREATE TABLE tt.default.tiny (k BIGINT, v STRING) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO tt.default.tiny VALUES (1, 'x')")
    val e1 = intercept[Exception](
      sql("SELECT * FROM tt.default.tiny VERSION AS OF 99").collect())
    assert(e1.getMessage.contains("unavailable"), e1.getMessage)
    val e2 = intercept[Exception](
      sql("SELECT * FROM tt.default.tiny TIMESTAMP AS OF timestamp_millis(1000)").collect())
    assert(e2.getMessage.contains("no committed version"), e2.getMessage)
  }

  test("a pinned read replays pre-DELETE state byte-for-byte") {
    sql("CREATE TABLE tt.default.replay (k BIGINT, n BIGINT) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO tt.default.replay SELECT id, id * 10 FROM range(0, 500)") // v1
    sql("DELETE FROM tt.default.replay WHERE k % 3 = 0")                        // v2
    assert(sql("SELECT count(*) FROM tt.default.replay").collect().head.getLong(0) == 333L)
    val pinned = sql("SELECT k, n FROM tt.default.replay VERSION AS OF 1")
    assert(pinned.count() == 500L)
    assert(pinned.where("k = 300").collect().head.getLong(1) == 3000L)
  }
}
