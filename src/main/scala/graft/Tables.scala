package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (see TESTDATA.md).
  * One parquet file per table under `$sfDir/<name>.parquet`.
  */
object Tables {
  /** Memoized ANALYZED RELATIONS per (session, corpus dir, table) — r21.
    * `spark.read.parquet` runs a footer/schema job every call, and
    * `registerAll` loads all ten tables, so every invocation of a SQL
    * query paid ~10 × 35 ms of driver-side schema jobs before its first
    * real task (measured via graft.JobProfile on q79). The cache holds
    * the DataFrame (plan + resolved file index) only — every action
    * still scans the parquet from disk, so no results or data are ever
    * reused across runs; this is the file-listing/schema cache the
    * optimization guide (§6) prescribes for repeatedly-read tables.
    * Keyed by session so fresh sessions (bench children) re-resolve.
    *
    * Freshness: a cached relation pins its FILE INDEX, and some callers
    * read corpora that mutate (the IVF staging flows append parquet
    * files into their corpus dir; specs rewrite corpora outright — the
    * first cut of this cache failed exactly those suites with stale
    * listings). Every hit therefore revalidates against a cheap stat
    * token — (mtime, length) of the path, plus each child's
    * (name, mtime, length) when it is a directory — a ~50 µs listing
    * versus the ~35 ms schema job; any mutation re-resolves. */
  private val relCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), (String, DataFrame)]

  private def statToken(path: String): String = {
    val f = new java.io.File(path)
    val kids = Option(f.listFiles()).map(_.sortBy(_.getName)
      .map(c => s"${c.getName}:${c.lastModified}:${c.length}").mkString("|"))
      .getOrElse("")
    s"${f.lastModified}:${f.length}:${kids.hashCode}"
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = (spark, new java.io.File(sfDir).getAbsolutePath, name)
    val token = statToken(path)
    relCache.get(key) match {
      case Some((t, df)) if t == token => df
      case _ =>
        val df = spark.read.parquet(path)
        relCache.put(key, (token, df))
        df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped with two physical types for `ts` across
    * driver testdata generations: TIMESTAMP(NANOS) (which Spark 4 only
    * reads via nanosAsLong → long) and plain timestamp[us] (which Spark 4
    * reads as TIMESTAMP_NTZ). Branch on the decoded schema so both work;
    * either way normalize to session TimestampType at micro precision
    * (identical to DuckDB's CAST(ts AS TIMESTAMP)). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val tsNorm = raw.schema("ts").dataType match {
      // nanos-as-long: integer div (not `/`, which is double division and
      // loses ulps at epoch-nanos magnitude) → DuckDB's ns→us truncation
      case LongType => timestamp_micros(expr("ts div 1000"))
      case TimestampType => col("ts")
      case _ => col("ts").cast(TimestampType) // TIMESTAMP_NTZ (timestamp[us])
    }
    raw.withColumn("ts", tsNorm)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  /** Normalized to array<float>: the ANN expressions (CosineSimilarity,
    * Int8Dot, LshBuckets) bind to FloatType elements, and a driver-side
    * regeneration switching precision (the events-ts lesson) must not
    * break them. Catalyst's SimplifyCasts removes the no-op cast while
    * the physical type already matches. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "embeddings")
    import org.apache.spark.sql.functions.col
    raw.withColumn("embedding", col("embedding").cast("array<float>"))
  }

  /** Register every corpus table as a temp view for spark.sql queries.
    * Registration is per-table fault-isolated: one table's loader
    * throwing (e.g. a driver-side schema regeneration the reader doesn't
    * handle yet) must not take down queries that never touch that table.
    * A failed table is simply not registered — queries that do use it
    * fail with TABLE_OR_VIEW_NOT_FOUND naming it, instead of every
    * registerAll caller dying at analysis time. */
  def registerAll(s: SparkSession, d: String): Unit = {
    def reg(name: String)(df: => DataFrame): Unit =
      try df.createOrReplaceTempView(name)
      catch {
        case e: Exception =>
          System.err.println(
            s"[graft] registerAll: table '$name' failed to load from $d " +
              s"(queries over it will fail; others are unaffected): ${e.getMessage}")
      }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents")
      .foreach(n => reg(n)(load(s, d, n)))
    reg("embeddings")(embeddings(s, d))
    reg("events")(events(s, d))
  }
}
