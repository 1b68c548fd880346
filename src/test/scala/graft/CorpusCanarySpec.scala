package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-drift canary: the driver regenerates /root/testdata between
  * rounds and has already changed a physical type once (events.ts went
  * TIMESTAMP(NANOS) → timestamp[us] before round 10, silently crashing
  * 14 bench queries). This spec opens EVERY corpus table through the
  * same loaders the queries use and asserts it can project + count, so
  * the next regeneration fails loudly here, named per table, instead of
  * as opaque downstream analysis errors.
  */
class CorpusCanarySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "region"     -> (() => Tables.region(spark, sfDir)),
    "nation"     -> (() => Tables.nation(spark, sfDir)),
    "customer"   -> (() => Tables.customer(spark, sfDir)),
    "supplier"   -> (() => Tables.supplier(spark, sfDir)),
    "part"       -> (() => Tables.part(spark, sfDir)),
    "orders"     -> (() => Tables.orders(spark, sfDir)),
    "lineitem"   -> (() => Tables.lineitem(spark, sfDir)),
    "events"     -> (() => Tables.events(spark, sfDir)),
    "documents"  -> (() => Tables.documents(spark, sfDir)),
    "embeddings" -> (() => Tables.embeddings(spark, sfDir)))

  for ((name, loader) <- loaders)
    test(s"corpus table '$name' loads, projects and counts") {
      val df = loader()
      assert(df.columns.nonEmpty, s"$name: empty schema")
      // full-width projection + count exercises decode of every column,
      // not just footer metadata
      val n = df.select(df.columns.map(col): _*).count()
      assert(n > 0, s"$name: zero rows at sf0.001")
    }

  test("events.ts is normalized to session TimestampType regardless of physical type") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts must be TimestampType, got ${ev.schema("ts").dataType}")
    // and values must be epoch-plausible (year 2000..2100), catching a
    // wrong-unit conversion (ns read as us would land in year ~1970)
    val yr = ev.agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .collect()(0)
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts years out of range: ${yr.getInt(0)}..${yr.getInt(1)} — unit bug?")
  }

  test("registerAll isolates a broken table instead of failing every query") {
    // a deliberately broken corpus dir: every table is valid except
    // events.parquet, which is a non-parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft-canary").toString
    for (t <- Seq("region", "nation")) {
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/events.parquet"), "not parquet".getBytes)

    val s2 = spark.newSession()
    Tables.registerAll(s2, dir) // must not throw
    // tables that loaded fine still answer queries
    assert(s2.sql("SELECT count(*) FROM region").collect()(0).getLong(0) == 5)
    // the broken one fails alone, with its name in the error
    val err = intercept[Exception](s2.sql("SELECT count(*) FROM events").collect())
    assert(err.getMessage.toLowerCase.contains("events"))
  }
}
