package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.kv.KvStore

/** Catalog UX surface: SHOW TBLPROPERTIES / SHOW PROCEDURES /
  * DESCRIBE PROCEDURE, and bucket-tag preservation through the
  * STREAMING sink (the last write path without a bucket test). */
class KvCatalogSurfaceSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-surface-wh").toString

  private lazy val ready: Unit = {
    spark.conf.set("spark.sql.catalog.sf", classOf[KvSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.sf.warehouse", wh)
  }
  private def sql(q: String) = { ready; spark.sql(q) }

  test("SHOW TBLPROPERTIES surfaces rowkey and buckets") {
    sql("""CREATE TABLE sf.default.props (id BIGINT, v STRING)
          |TBLPROPERTIES ('rowkey'='id', 'buckets'='4')""".stripMargin)
    val props = sql("SHOW TBLPROPERTIES sf.default.props").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("rowkey").contains("id"))
    assert(props.get("buckets").contains("4"))
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE work against the catalog") {
    ready
    val rows = sql("SHOW PROCEDURES IN sf").collect().map(_.mkString("|")).toSet
    Seq("compact", "vacuum", "fsck", "history").foreach(p =>
      assert(rows.exists(_.contains(p)), s"$p missing from $rows"))
    val desc = sql("DESCRIBE PROCEDURE sf.system.compact").collect()
      .map(_.getString(0)).mkString("\n")
    assert(desc.contains("compact"), desc)
  }

  test("streaming sink preserves bucket tags; SPJ works on a streamed table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = { ready; spark.sqlContext }
    import spark.implicits._
    sql("""CREATE TABLE sf.default.streamed (id BIGINT, v BIGINT)
          |TBLPROPERTIES ('rowkey'='id', 'buckets'='4')""".stripMargin)
    val dir = s"$wh/default/streamed"
    val cat = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_kvcatalog.json")), "UTF-8")
    val mem = MemoryStream[Long]
    val q = mem.toDF().select(col("value").as("id"), (col("value") * 2).as("v"))
      .writeStream.format("graft-kv")
      .option("catalog", cat).option("path", dir)
      .option("checkpointLocation", Files.createTempDirectory("graft-sf-ck").toString)
      .start()
    mem.addData(0L until 200L: _*)
    q.processAllAvailable()
    mem.addData(200L until 400L: _*)
    q.processAllAvailable()
    q.stop()
    val shards = KvStore.readMeta(dir).shards
    assert(shards.nonEmpty && shards.forall(s => s.bucket >= 0 && s.bucket < 4),
      s"streamed shards must carry bucket tags: ${shards.map(_.bucket).toSeq}")
    // the streamed table co-joins with a batch-written bucketed table
    sql("""CREATE TABLE sf.default.dim4 (id BIGINT, w BIGINT)
          |TBLPROPERTIES ('rowkey'='id', 'buckets'='4')""".stripMargin)
    sql("INSERT INTO sf.default.dim4 SELECT id, id * 3 FROM range(0, 400)")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = sql("""SELECT /*+ MERGE(d) */ s.id, s.v, d.w
                    FROM sf.default.streamed s JOIN sf.default.dim4 d ON s.id = d.id""")
    df.collect()
    assert(!df.queryExecution.executedPlan.toString().contains("Exchange"))
    assert(df.count() == 400)
  }
}
