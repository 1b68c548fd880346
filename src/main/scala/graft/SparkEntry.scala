package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from graft.Registry: each Q
  * couples a Spark implementation with its DuckDB oracle SQL (when the
  * semantics are ANSI-expressible).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape mirrors the reference's canonical test query
    * (`/root/reference/src/test/scala/ScalaDatasourceTest.scala:88-91`):
    * IN + OR predicate over a keyed table, here joined one hop out. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
    c.filter(col("c_custkey").isin(1, 2, 3, 4, 5) || col("c_name") === "Customer#000000010")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
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
