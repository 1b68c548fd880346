package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from graft.Registry: each Q
  * couples a Spark implementation with its DuckDB oracle SQL (when the
  * semantics are ANSI-expressible).
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's canonical end-to-end path, run through OUR stack:
    * customer rows flow through the graft-kv write path into a sorted
    * KV table, and the reference's canonical IN + OR query shape
    * (`/root/reference/src/test/scala/ScalaDatasourceTest.scala:88-91`)
    * is answered by the connector's pushdown scan via spark.sql. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val catalogJson =
      """{"table":{"namespace":"default","name":"customer_kv"},"rowkey":"c_custkey",
        | "columns":{
        |  "c_custkey":{"cf":"rowkey","col":"c_custkey","type":"long"},
        |  "c_name":{"cf":"f","col":"name","type":"string"},
        |  "c_nationkey":{"cf":"f","col":"nk","type":"int"},
        |  "c_acctbal":{"cf":"f","col":"bal","type":"double"},
        |  "c_mktsegment":{"cf":"f","col":"seg","type":"string"}}}""".stripMargin
    val dir = graft.kv.KvStore.cacheDir("customer-entry")
    if (!new java.io.File(s"$dir/_kvmeta.json").exists()) {
      Tables.customer(spark, d)
        .repartitionByRange(4, col("c_custkey"))
        .write.format("graft-kv")
        .option("catalog", catalogJson).option("path", dir)
        .mode("overwrite").save()
    }
    spark.read.format("graft-kv")
      .option("catalog", catalogJson).option("path", dir).load()
      .createOrReplaceTempView("customer_kv")
    spark.sql("""
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer_kv
      WHERE c_custkey IN (1, 2, 3, 4, 5) OR c_name = 'Customer#000000010'
      ORDER BY c_custkey""")
  }

  /** Output normalization: Spark writes TimestampType as UTC-adjusted
    * parquet (`isAdjustedToUTC=true`) while the DuckDB oracle computes
    * naive timestamps from the naive corpus files. Casting final
    * timestamp columns to TIMESTAMP_NTZ (wall-clock identical under the
    * UTC session) makes both sides serialize the same logical value. */
  private def ntzify(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampType
    if (!df.schema.exists(_.dataType == TimestampType)) df
    else df.select(df.schema.fields.map { f =>
      if (f.dataType == TimestampType) col(f.name).cast("timestamp_ntz").as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name ->
      ((s: SparkSession, d: String) => ntzify(q.fn(s, d)))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
