package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // repeat each query and report the MIN: single runs at local[32] carry
    // ±4x JIT/GC/scheduling jitter, which buries real regressions
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen + one-time KV table ingest stay out of timings
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries("q70_kv_scan_filter")(spark, sfDir).queryExecution.toRdd.count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to repeats).flatMap { _ =>
        val t0 = System.nanoTime()
        // toRdd.count() materializes the FULL physical plan (projections,
        // sorts, limits) without collecting to the driver; plain count()
        // would let Catalyst prune most of the query away.
        try { fn(spark, sfDir).queryExecution.toRdd.count()
              Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None }
      }
      if (times.isEmpty) failed += name
      // -1.0 = sentinel: a crashing query must never look like a fast one
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","repeats":$repeats,"failed":$failedJson}""")
    spark.stop()
  }
}
