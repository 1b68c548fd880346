package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.kv.KvStore

/** `CALL`-able maintenance procedures: compact / vacuum / fsck /
  * history through the SQL catalog — one statement per operator task,
  * no second code path (each wraps the engine's existing locked
  * maintenance machinery). */
class KvProceduresSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-proc-wh").toString

  private lazy val ready: Unit = {
    spark.conf.set("spark.sql.catalog.pc", classOf[KvSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.pc.warehouse", wh)
  }
  private def sql(q: String) = { ready; spark.sql(q) }

  test("compact merges small shards and reports the output count") {
    sql("CREATE TABLE pc.default.cmp (k BIGINT, v STRING) TBLPROPERTIES ('rowkey'='k')")
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO pc.default.cmp SELECT id, CAST(id AS STRING) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})"))
    assert(KvStore.readMeta(s"$wh/default/cmp").shards.length >= 4)
    val out = sql("CALL pc.system.compact(tbl => 'default.cmp')").collect()
    assert(out.head.getInt(0) > 0, "compact should report outputs written")
    assert(sql("SELECT count(*) FROM pc.default.cmp").collect().head.getLong(0) == 400L)
  }

  test("history lists retained versions; vacuum trims them on the grace clock") {
    sql("CREATE TABLE pc.default.hst (k BIGINT, v STRING) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO pc.default.hst VALUES (1, 'a')")
    sql("INSERT INTO pc.default.hst VALUES (2, 'b')")
    sql("INSERT INTO pc.default.hst VALUES (3, 'c')")
    val hist = sql("CALL pc.system.history(tbl => 'default.hst')").collect()
    assert(hist.map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L, 3L))
    assert(hist.count(_.getBoolean(4)) == 1, "exactly one current version")
    // every retained version is readable via time travel
    assert(sql("SELECT count(*) FROM pc.default.hst VERSION AS OF 1")
      .collect().head.getLong(0) == 1L)
    // grace 0: superseded archives are reclaimable immediately
    val removed = sql("CALL pc.system.vacuum(tbl => 'default.hst', grace_minutes => 0)")
      .collect().head.getInt(0)
    assert(removed >= 2, s"expected the two archived manifests gone, removed=$removed")
    intercept[Exception](
      sql("SELECT count(*) FROM pc.default.hst VERSION AS OF 1").collect())
    // the live table is untouched
    assert(sql("SELECT count(*) FROM pc.default.hst").collect().head.getLong(0) == 3L)
  }

  test("fsck verifies CRCs and fails loudly on a flipped bit") {
    sql("CREATE TABLE pc.default.chk (k BIGINT, v STRING) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO pc.default.chk SELECT id, CAST(id AS STRING) FROM range(0, 50)")
    assert(sql("CALL pc.system.fsck(tbl => 'default.chk')").collect().head.getInt(0) >= 1)
    // flip one byte mid-file
    val shard = KvStore.readMeta(s"$wh/default/chk").shards.head
    val f = new java.io.File(s"$wh/default/chk/${shard.file}")
    val raf = new java.io.RandomAccessFile(f, "rw")
    raf.seek(f.length() / 2)
    val b = raf.read(); raf.seek(f.length() / 2); raf.write(b ^ 0x40)
    raf.close()
    val e = intercept[Exception](
      sql("CALL pc.system.fsck(tbl => 'default.chk')").collect())
    assert(e.getMessage.contains("corrupt"), e.getMessage)
  }

  test("unknown procedure and unknown table fail with clear errors") {
    ready
    intercept[Exception](sql("CALL pc.system.nope(tbl => 'default.x')").collect())
    val e = intercept[Exception](
      sql("CALL pc.system.fsck(tbl => 'default.missing_tbl')").collect())
    assert(e.getMessage.contains("no such table"), e.getMessage)
  }
}
