package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for perf iteration: runs one registered
  * query N times in-process (same action as Bench: `toRdd.count()`
  * materializes the full physical plan without a driver collect) and
  * prints per-repeat plus min times. Bench remains the canonical
  * fresh-JVM harness; this is the quick feedback loop between edits.
  *
  * Usage: runMain graft.TimeQuery <query> [repeats] [sfDir]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // separate knob: partition COUNT is a data-volume decision, thread
    // count a hardware one — above ~10× the sf0.1 tier they must part ways
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (1 to repeats).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name #$i: $dt%.3f s")
      dt
    }
    println(f"[time] $name min=${times.min}%.3f s over $repeats repeats @ $sfDir")
    queries.Dedup.releaseShingles()
    queries.Curation.releaseTokenCounts()
    spark.stop()
  }
}
