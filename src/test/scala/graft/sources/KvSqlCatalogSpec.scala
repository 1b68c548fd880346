package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row

/** SQL-catalog DDL surface: CREATE/ALTER/RENAME/DROP TABLE, namespaces,
  * and DML through the catalog identifier — the temp-view-free workflow
  * the reference cannot offer (its catalog JSON travels per-query as an
  * option string). */
class KvSqlCatalogSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-sqlcat").toString

  private lazy val ready: Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[KvSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
  }
  private def sql(q: String) = { ready; spark.sql(q) }

  test("CREATE TABLE + INSERT + SELECT round-trips through the catalog") {
    sql("""CREATE TABLE graft.default.people (id BIGINT, name STRING, age INT)
          |TBLPROPERTIES ('rowkey'='id')""".stripMargin)
    sql("INSERT INTO graft.default.people VALUES (1, 'ada', 36), (2, 'gus', 7), (3, 'mia', 62)")
    assert(sql("SELECT name FROM graft.default.people WHERE id = 2")
      .collect().map(_.getString(0)).toSeq == Seq("gus"))
    // the loaded table is the full KvTable: filters PUSH through SQL too
    val df = sql("SELECT id FROM graft.default.people WHERE age > 30")
    assert(df.queryExecution.executedPlan.toString().contains("GreaterThan(age,30)"),
      "catalog-loaded scans must negotiate pushdown like path-loaded ones")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // the persisted catalog JSON is the reference's map form: a path
    // reader can open the same table directly
    val dir = s"$wh/default/people"
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_kvcatalog.json")), "UTF-8")
    val viaPath = spark.read.format("graft-kv")
      .option("catalog", json).option("path", dir).load()
    assert(viaPath.count() == 3)
  }

  test("SHOW TABLES lists catalog tables; DROP TABLE removes data") {
    sql("CREATE TABLE graft.default.t_drop (k BIGINT, v STRING) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO graft.default.t_drop VALUES (1, 'x')")
    val names = sql("SHOW TABLES IN graft.default").collect().map(_.getString(1)).toSet
    assert(names.contains("t_drop"))
    sql("DROP TABLE graft.default.t_drop")
    assert(!sql("SHOW TABLES IN graft.default").collect().map(_.getString(1)).toSet
      .contains("t_drop"))
    assert(!new java.io.File(s"$wh/default/t_drop/_kvcatalog.json").exists())
    intercept[Exception](sql("SELECT * FROM graft.default.t_drop").collect())
  }

  test("ALTER TABLE ADD COLUMN: old rows read NULL, new writes carry it") {
    sql("CREATE TABLE graft.default.t_evolve (k BIGINT, v STRING) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO graft.default.t_evolve VALUES (1, 'old')")
    sql("ALTER TABLE graft.default.t_evolve ADD COLUMN note STRING")
    sql("INSERT INTO graft.default.t_evolve VALUES (2, 'new', 'hello')")
    val rows = sql("SELECT k, note FROM graft.default.t_evolve ORDER BY k").collect()
    assert(rows(0) == Row(1L, null) && rows(1) == Row(2L, "hello"))
    // DROP COLUMN is metadata-only; remaining columns read on
    sql("ALTER TABLE graft.default.t_evolve DROP COLUMN note")
    assert(sql("SELECT * FROM graft.default.t_evolve").columns.toSeq == Seq("k", "v"))
    assert(sql("SELECT v FROM graft.default.t_evolve WHERE k = 2")
      .collect().head.getString(0) == "new")
    // the rowkey is load-bearing: dropping it must fail
    intercept[Exception](sql("ALTER TABLE graft.default.t_evolve DROP COLUMN k"))
  }

  test("SQL DML (UPDATE / DELETE / MERGE) works on catalog identifiers") {
    sql("CREATE TABLE graft.default.t_dml (k BIGINT, v STRING, n INT) TBLPROPERTIES ('rowkey'='k')")
    sql("INSERT INTO graft.default.t_dml VALUES (1,'a',10), (2,'b',20), (3,'c',30)")
    sql("UPDATE graft.default.t_dml SET v = 'B' WHERE k = 2")
    sql("DELETE FROM graft.default.t_dml WHERE n >= 30")
    sql("""MERGE INTO graft.default.t_dml t USING (SELECT 1 AS k, 99 AS n) s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.n = s.n
          |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, 'z', s.n)""".stripMargin)
    assert(sql("SELECT k, v, n FROM graft.default.t_dml ORDER BY k").collect().toSeq ==
      Seq(Row(1L, "a", 99), Row(2L, "B", 20)))
  }

  test("CTAS, RENAME, and per-column family overrides") {
    sql("""CREATE TABLE graft.default.t_ctas TBLPROPERTIES ('rowkey'='id') AS
          |SELECT CAST(id AS BIGINT) AS id, CAST(id % 3 AS INT) AS bucket
          |FROM range(10)""".stripMargin)
    assert(sql("SELECT count(*) FROM graft.default.t_ctas").collect().head.getLong(0) == 10)
    // Spark hands the RENAME TO target to the source catalog unresolved,
    // so it is spelled without the catalog prefix
    sql("ALTER TABLE graft.default.t_ctas RENAME TO default.t_renamed")
    assert(sql("SELECT count(*) FROM graft.default.t_renamed").collect().head.getLong(0) == 10)
    intercept[Exception](sql("SELECT * FROM graft.default.t_ctas").collect())
    // cf./qualifier. properties control the cell binding
    sql("""CREATE TABLE graft.default.t_cf (k BIGINT, v STRING)
          |TBLPROPERTIES ('rowkey'='k', 'cf.v'='payload', 'qualifier.v'='val')""".stripMargin)
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$wh/default/t_cf/_kvcatalog.json")), "UTF-8")
    assert(json.contains("\"payload\"") && json.contains("\"val\""))
    sql("INSERT INTO graft.default.t_cf VALUES (7, 'seven')")
    assert(sql("SELECT v FROM graft.default.t_cf WHERE k = 7")
      .collect().head.getString(0) == "seven")
  }

  test("namespaces: create, list, and guard rails") {
    sql("CREATE NAMESPACE graft.lab")
    assert(sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
      .contains("lab"))
    sql("CREATE TABLE graft.lab.t (k BIGINT) TBLPROPERTIES ('rowkey'='k')")
    assert(sql("SHOW TABLES IN graft.lab").collect().map(_.getString(1)).toSeq == Seq("t"))
    // non-cascade drop of a non-empty namespace refuses
    intercept[Exception](sql("DROP NAMESPACE graft.lab"))
    sql("DROP NAMESPACE graft.lab CASCADE")
    assert(!sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
      .contains("lab"))
    // creating a table in a missing namespace names the real problem
    intercept[Exception](
      sql("CREATE TABLE graft.nope.t (k BIGINT) TBLPROPERTIES ('rowkey'='k')"))
    // PARTITIONED BY has no meaning over rowkey-range shards
    intercept[Exception](sql(
      "CREATE TABLE graft.default.t_part (k BIGINT, d STRING) PARTITIONED BY (d) TBLPROPERTIES ('rowkey'='k')"))
  }

  test("CREATE TABLE with ARRAY<FLOAT> / MAP columns (SQL nullable variants normalize)") {
    // SQL ARRAY<FLOAT> parses to containsNull=true; the cell encoding is
    // element-null-free, so creation must normalize instead of rejecting
    sql("""CREATE TABLE graft.default.t_emb (id BIGINT, embedding ARRAY<FLOAT>,
          |tags MAP<STRING, STRING>) TBLPROPERTIES ('rowkey'='id')""".stripMargin)
    sql("INSERT INTO graft.default.t_emb VALUES " +
      "(1, array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT)), map('a', 'x'))")
    val r = sql("SELECT embedding, tags FROM graft.default.t_emb WHERE id = 1").collect().head
    assert(r.getSeq[Float](0) == Seq(0.5f, -1.25f))
    assert(r.getMap[String, String](1) == Map("a" -> "x"))
    // ALTER ADD COLUMN takes the same normalization path
    sql("ALTER TABLE graft.default.t_emb ADD COLUMN extra ARRAY<FLOAT>")
    sql("INSERT INTO graft.default.t_emb VALUES " +
      "(2, array(CAST(1.0 AS FLOAT)), map('b', 'y'), array(CAST(2.0 AS FLOAT)))")
    assert(sql("SELECT extra FROM graft.default.t_emb WHERE id = 2")
      .collect().head.getSeq[Float](0) == Seq(2.0f))
  }
}
