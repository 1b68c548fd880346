package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Split events into two parquet chunks so the file source produces
    * two deterministic micro-batches. */
  private lazy val chunkDir: String = {
    val dir = Files.createTempDirectory("graft-events-stream").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet") // ts stays long ns
    raw.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/c0")
    raw.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/c1")
    val flat = Files.createTempDirectory("graft-events-flat").toString
    // file source wants one directory of files
    import java.nio.file.{Path, Paths, StandardCopyOption}
    def mv(sub: String, name: String): Unit = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath, Paths.get(s"$flat/$name"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    mv("c0", "part-0.parquet"); mv("c1", "part-1.parquet")
    flat
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling windowed counts: every emitted window matches the batch result") {
    val out = runToMemory(
      EventsStream.tumblingCounts(EventsStream.readStream(spark, chunkDir)),
      "tumbling_out", "append")
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
    val emitted = out.select("window_start", "event_type", "n")
    // append mode withholds windows still above watermark → subset match
    assert(emitted.count() > 0, "watermark must have released some windows")
    assert(emitted.except(batch).count() == 0,
      "every emitted streaming window must equal its batch twin")
  }

  test("session windows: emitted sessions match batch session_window") {
    val out = runToMemory(
      EventsStream.sessionCounts(EventsStream.readStream(spark, chunkDir)),
      "session_out", "append")
    val batch = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
    assert(out.count() > 0)
    assert(out.except(batch).count() == 0)
  }

  test("streaming dedup: redelivered events collapse to one row each") {
    // duplicate BOTH chunks into a fresh dir → every event arrives twice
    // (one trigger: duplicates must land within the watermark delay for
    // dropDuplicatesWithinWatermark's bounded-state guarantee to apply;
    // redelivery later than the lateness budget is by-contract dropped)
    val dupDir = Files.createTempDirectory("graft-events-dup").toString
    new java.io.File(chunkDir).listFiles().zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(s"$dupDir/a$i.parquet"))
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(s"$dupDir/b$i.parquet"))
    }
    val out = runToMemory(
      EventsStream.dedupEvents(
        EventsStream.readStream(spark, dupDir, maxFilesPerTrigger = 4)),
      "dedup_out", "append")
    val expected = Tables.events(spark, sfDir).count()
    assert(out.count() == expected,
      s"each redelivered event must survive exactly once (${out.count()} vs $expected)")
    assert(out.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("stream-stream attribution join equals the batch interval join") {
    // time-ordered chunks (first/second half of the event-time range) so
    // the watermark advances monotonically and no input arrives late —
    // under that feed the inner interval join must emit EVERY batch match
    val dir = Files.createTempDirectory("graft-events-timechunks").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // ts is long ns in old testdata, timestamp[us]/NTZ in new — midpoint
    // split on a comparable long key either way
    val tsKey = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    val mid = raw.agg((min(tsKey) + (max(tsKey) - min(tsKey)) / 2)
        .cast("long").as("m"))
      .collect()(0).getLong(0)
    // FileStreamSource orders files by modification time — pin mtimes
    // explicitly so chunk order can't flip on a coarse-mtime filesystem
    // (out-of-order chunks would advance the watermark past part-0 and
    // legitimately drop its rows as late)
    def chunk(df: DataFrame, name: String, mtimeMs: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-ev-chunk").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$dir/$name"))
      assert(new java.io.File(s"$dir/$name").setLastModified(mtimeMs))
    }
    chunk(raw.filter(tsKey <= mid), "part-0.parquet", 1000000L)
    chunk(raw.filter(tsKey > mid), "part-1.parquet", 2000000L)

    val out = runToMemory(
      EventsStream.attributionJoin(EventsStream.readStream(spark, dir)),
      "attribution_out", "append")
    val ev = Tables.events(spark, sfDir)
    val batch = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
            col("ts").as("click_ts")),
        col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        col("view_ts"), col("click_ts"))
    assert(out.count() > 0, "attribution window must produce matches (vacuity guard)")
    assert(out.except(batch).count() == 0,
      "streamed join must never invent a pair the batch join lacks")
    assert(batch.except(out).count() == 0,
      "with an in-order feed the streamed inner join must emit every batch match")
  }

  test("mapGroupsWithState accumulates per-user totals across micro-batches") {
    val out = runToMemory(
      EventsStream.runningUserTotals(EventsStream.readStream(spark, chunkDir)).toDF(),
      "running_out", "update")
    // final state per user (max n_events across updates) == batch count
    val finalPerUser = out.groupBy("user_id").agg(max("n_events").as("n_events"))
    val batch = Tables.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    assert(finalPerUser.except(batch).count() == 0)
    assert(batch.except(finalPerUser).count() == 0)
  }

  test("readStream starts on an initially-empty directory and picks up the first file") {
    val empty = Files.createTempDirectory("graft-events-empty").toString
    // schema sniff has no footer to read — must fall back, not throw
    val df = EventsStream.readStream(spark, empty)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName("events_empty_start").start()
    try {
      q.processAllAvailable()
      assert(spark.table("events_empty_start").count() == 0)
      // first file lands AFTER the stream started (nanos-long shape,
      // matching the rawSchema fallback)
      val src = new java.io.File(chunkDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(s"$empty/${src.getName}"))
      q.processAllAvailable()
      assert(spark.table("events_empty_start").count() > 0,
        "rows must flow once the first file lands")
    } finally q.stop()
  }
}
