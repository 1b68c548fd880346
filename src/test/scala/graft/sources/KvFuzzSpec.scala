package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded end-to-end fuzz of the KV connector: random datasets with
  * adversarial values (full integer domains, ±0.0, infinities, unicode
  * across planes, nulls) round-trip through write → scan, and random
  * pushable predicates return exactly the rows Spark computes on the
  * original frame — the integration property the per-filter matrix
  * can't cover combinatorially. Deterministic seed → no flakes. */
class KvFuzzSpec extends SparkSpec {

  private val cat =
    """{"table":{"name":"fuzz"},"rowkey":"k",
      | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
      |            "s":{"cf":"f","col":"s","type":"string"},
      |            "i":{"cf":"f","col":"i","type":"int"},
      |            "d":{"cf":"f","col":"d","type":"double"},
      |            "b":{"cf":"f","col":"b","type":"boolean"},
      |            "c":{"cf":"f","col":"c","type":"string"}}}""".stripMargin

  private def randomString(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(8)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 => sb.append(('a' + rnd.nextInt(26)).toChar)
        case 1 => sb.append(('À' + rnd.nextInt(64)).toChar)      // Latin-1 sup
        case 2 => sb.append(('\uE000' + rnd.nextInt(256)).toChar)     // PUA
        case 3 => sb.appendAll(Character.toChars(0x10000 + rnd.nextInt(1024))) // SMP
      }
    }
    sb.toString
  }

  private def randomDouble(rnd: scala.util.Random): Double = rnd.nextInt(8) match {
    case 0 => 0.0
    case 1 => -0.0
    case 2 => Double.MaxValue
    case 3 => Double.MinPositiveValue
    case 4 => Double.NegativeInfinity
    case _ => rnd.nextGaussian() * 1e6
  }

  test("random datasets round-trip and random pushable predicates match Spark") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (iter <- 1 to 3) {
      val rows = (0 until 300).map { j =>
        (j.toLong + rnd.nextInt(5) * 1000L, // some key gaps
          randomString(rnd),
          rnd.nextInt(4) match { case 0 => Int.MinValue; case 1 => Int.MaxValue; case _ => rnd.nextInt() },
          randomDouble(rnd),
          rnd.nextBoolean(),
          if (rnd.nextBoolean()) null else randomString(rnd))
      }.groupBy(_._1).map(_._2.head).toSeq // rowkeys must be unique
      val src = rows.toDF("k", "s", "i", "d", "b", "c")
      val dir = Files.createTempDirectory(s"graft-kv-fuzz$iter").toString
      src.write.format("graft-kv").option("catalog", cat).option("path", dir)
        .option("chunkBytes", if (iter == 2) "1024" else (256L << 20).toString)
        .mode("overwrite").save()
      val back = spark.read.format("graft-kv").option("catalog", cat).option("path", dir).load()

      def keySet(df: DataFrame, pred: Option[Column]): Seq[Long] =
        pred.fold(df)(df.filter(_)).select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(keySet(back, None) == keySet(src, None), s"iter $iter: round-trip row set")

      val pivot = rows(rnd.nextInt(rows.length))
      val preds: Seq[Column] = Seq(
        col("k") > pivot._1, col("k") <= pivot._1,
        col("s") > pivot._2, col("s") <= pivot._2,
        col("i") >= pivot._3, col("i") < pivot._3,
        col("d") > pivot._4, col("d") <= pivot._4,
        col("b") === pivot._5,
        col("c").isNull, col("c").isNotNull,
        col("k") > pivot._1 && col("i") < pivot._3,
        col("s") <= pivot._2 || col("d") > pivot._4,
        col("k").isin(rows.take(5).map(_._1): _*),
        // multi-range planner shapes (KeyRanges): sparse IN ∪ band,
        // range-clipped IN, and a provably-empty conjunction
        col("k").isin(rows.take(3).map(_._1) :+ 999999L: _*) ||
          (col("k") >= pivot._1 - 50 && col("k") <= pivot._1 + 50),
        col("k").isin(rows.take(8).map(_._1): _*) && col("k") > pivot._1,
        col("k") > pivot._1 && col("k") < pivot._1 - 10,
        (col("k") === pivot._1 || col("k") === rows.head._1) && col("i") < pivot._3)
      preds.zipWithIndex.foreach { case (p, pi) =>
        assert(keySet(back, Some(p)) == keySet(src, Some(p)),
          s"iter $iter predicate #$pi diverged: $p")
      }
    }
  }

  test("fuzz: string zone maps prune correctly under adversarial strings") {
    // strings are the dominant predicate class of the curation suite
    // (lang = 'en' style): fuzz equality/range/IN string predicates over
    // shards whose manifests carry UTF8-binary string bounds, including
    // multi-byte planes and >64-byte values that poison a chunk's bounds
    import spark.implicits._
    val zCat =
      """{"table":{"name":"zstr"},"rowkey":"k",
        | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
        |            "lang":{"cf":"f","col":"l","type":"string"},
        |            "txt":{"cf":"f","col":"t","type":"string"}}}""".stripMargin
    val rnd = new scala.util.Random(7331)
    val langs = Vector("ar", "de", "en", "es", "fr", "hi", "ja", "zh", "𐐀x")
    for (iter <- 1 to 3) {
      val rows = (1 to 640).map { k =>
        // lang monotone in k → range shards carry tight disjoint bounds
        val lang = langs((k - 1) * langs.length / 640)
        val txt =
          if (rnd.nextInt(40) == 0) randomString(rnd) + ("y" * 100) // poisons bounds
          else randomString(rnd)
        (k.toLong, lang, txt)
      }
      val src = rows.toDF("k", "lang", "txt")
      val dir = Files.createTempDirectory(s"graft-kv-zstr$iter").toString
      src.repartitionByRange(8, col("k"))
        .write.format("graft-kv").option("catalog", zCat).option("path", dir)
        .mode("overwrite").save()
      def read(): DataFrame = spark.read.format("graft-kv")
        .option("catalog", zCat).option("path", dir).load()
      def keySet(df: DataFrame, p: Column): Seq[Long] =
        df.filter(p).select("k").collect().map(_.getLong(0)).sorted.toSeq

      val pivotLang = langs(rnd.nextInt(langs.length))
      val pivotTxt = rows(rnd.nextInt(rows.length))._3
      val preds: Seq[Column] = Seq(
        col("lang") === pivotLang, col("lang") < pivotLang,
        col("lang") >= pivotLang, col("lang").isin("en", "zh"),
        col("txt") === pivotTxt, col("txt") <= pivotTxt,
        col("lang") === pivotLang && col("txt") > pivotTxt,
        // prefix window pruning (StartsWith → [p, successor(p)) bounds),
        // incl. a multi-byte prefix whose successor is not valid UTF-8
        col("lang").startsWith(pivotLang.take(1)),
        col("txt").startsWith(pivotTxt.take(2)),
        col("lang").startsWith("𐐀"))
      preds.zipWithIndex.foreach { case (p, pi) =>
        assert(keySet(read(), p) == keySet(src, p),
          s"iter $iter string predicate #$pi diverged: $p")
      }
      // a single-language equality must PRUNE (langs span ≥8 shard
      // bounds ranges, so no one language covers all 8) and the pruning
      // must be visible in the scan's zone-map metric
      val one = read().filter(col("lang") === pivotLang)
      assert(one.rdd.getNumPartitions < 8,
        s"iter $iter: lang='$pivotLang' must prune some of the 8 shards")
      one.collect()
      val zm = one.queryExecution.executedPlan.collectLeaves().head.metrics
      assert(zm("kvShardsPrunedZoneMap").value > 0,
        s"iter $iter: string pruning must surface in kvShardsPrunedZoneMap")
    }
  }

  test("fuzz: DELETE keeps exactly the rows where the condition is not TRUE") {
    // differential against Spark's own three-valued filter semantics:
    // SQL DELETE removes rows where the condition is TRUE; FALSE and
    // UNKNOWN survive. Expected survivors are computed by Spark on the
    // source frame as NOT(coalesce(cond, false)).
    import spark.implicits._
    val rnd = new scala.util.Random(90210)
    val rows = (1 to 300).map { j =>
      (j.toLong, randomString(rnd), rnd.nextInt(100) - 50,
        randomDouble(rnd),
        if (rnd.nextBoolean()) null else randomString(rnd))
    }
    val src = rows.toDF("k", "s", "i", "d", "c")
    val delCat =
      """{"table":{"name":"delfuzz"},"rowkey":"k",
        | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
        |            "s":{"cf":"f","col":"s","type":"string"},
        |            "i":{"cf":"f","col":"i","type":"int"},
        |            "d":{"cf":"f","col":"d","type":"double"},
        |            "c":{"cf":"f","col":"c","type":"string"}}}""".stripMargin
    val pivot = rows(rnd.nextInt(rows.length))
    val sLit = pivot._2.replace("'", "''")
    // a pivot double of ±Infinity/NaN has no SQL literal form
    val dLit = if (pivot._4.isInfinite || pivot._4.isNaN) "0.0" else pivot._4.toString
    val conds = Seq(
      s"k <= ${pivot._1}",
      s"i > ${pivot._3}",
      s"c = '$sLit'",                        // UNKNOWN on null c rows
      s"NOT (c = '$sLit')",                  // three-valued Not
      s"k > ${pivot._1} AND i < ${pivot._3}",
      s"s <= '$sLit' OR c IS NULL",
      s"i IN (${pivot._3}, ${pivot._3 + 7}) OR d > $dLit",
      "c IS NOT NULL AND NOT (i = 0)")
    conds.zipWithIndex.foreach { case (cond, ci) =>
      val dir = Files.createTempDirectory(s"graft-kv-delfuzz$ci").toString
      src.repartitionByRange(4, col("k"))
        .write.format("graft-kv").option("catalog", delCat).option("path", dir)
        .mode("overwrite").save()
      spark.sql(s"DROP TABLE IF EXISTS graft_delfuzz")
      spark.sql(s"""
        CREATE TABLE graft_delfuzz USING `graft-kv`
        OPTIONS (catalog '${delCat.replace("'", "''").replace("\n", " ")}', path '$dir')""")
      try {
        spark.sql(s"DELETE FROM graft_delfuzz WHERE $cond")
        val got = spark.table("graft_delfuzz")
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
        val expect = src.filter(!coalesce(expr(cond), lit(false)))
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
        assert(got == expect,
          s"DELETE WHERE $cond: kept ${got.length}, Spark keeps ${expect.length}")
      } finally spark.sql("DROP TABLE IF EXISTS graft_delfuzz")
    }
  }

  test("values larger than the reader buffer round-trip and skip correctly") {
    // the shard reader parses from a 1 MiB buffer: a 3 MiB value forces
    // the ensure() growth path when projected and the stream-skip path
    // (buffer bypass) when parse-pruned — both must preserve neighbors
    import spark.implicits._
    val bigCat =
      """{"table":{"name":"big"},"rowkey":"k",
        | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
        |            "big":{"cf":"f","col":"big","type":"string"},
        |            "tag":{"cf":"f","col":"tag","type":"string"}}}""".stripMargin
    val rnd = new scala.util.Random(11)
    val rows = (1 to 12).map { k =>
      val big =
        if (k % 3 == 0) ("x" * (3 << 20)) + k  // 3 MiB, unique tail
        else randomString(rnd)
      (k.toLong, big, s"tag$k")
    }
    val dir = Files.createTempDirectory("graft-kv-big").toString
    rows.toDF("k", "big", "tag").coalesce(1)
      .write.format("graft-kv").option("catalog", bigCat).option("path", dir)
      .mode("overwrite").save()
    def read() = spark.read.format("graft-kv")
      .option("catalog", bigCat).option("path", dir).load()
    // projected: growth path decodes the 3 MiB values intact
    val got = read().select("k", "big").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (k, big, _) => assert(got(k) == big, s"k=$k big value") }
    // parse-pruned: the huge values are skipped in the stream; the cells
    // after them must still parse
    val tags = read().select("k", "tag").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (k, _, tag) => assert(tags(k) == tag, s"k=$k tag after skip") }
    // and a filter on the huge column itself (decode + compare)
    assert(read().filter(col("big") === rows(2)._2).select("k").collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("a truncated shard file fails loudly, never silently returns fewer rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kv-trunc").toString
    val tCat =
      """{"table":{"name":"trunc"},"rowkey":"k",
        | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
        |            "v":{"cf":"f","col":"v","type":"string"}}}""".stripMargin
    (1 to 500).map(k => (k.toLong, s"value-$k")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("catalog", tCat).option("path", dir)
      .mode("overwrite").save()
    val shard = graft.kv.KvStore.readMeta(dir).shards.head
    val f = new java.io.File(s"$dir/${shard.file}")
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(f.length() - 7) finally ch.close() // cut mid-record
    // NOT count(): pure COUNT(*) answers from the manifest alone and
    // never opens the file — collect() forces the record scan
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-kv").option("catalog", tCat).option("path", dir)
        .load().collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(c => c.isInstanceOf[java.io.EOFException] &&
      c.getMessage != null && c.getMessage.contains(shard.file)),
      s"expected a truncated-shard EOFException naming the file, got: $ex")
  }

  test("random projections agree across row and columnar readers under parse-time cell skipping") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { j =>
      (j.toLong, randomString(rnd), rnd.nextInt(), randomDouble(rnd),
        rnd.nextBoolean(), if (rnd.nextBoolean()) null else randomString(rnd))
    }
    val src = rows.toDF("k", "s", "i", "d", "b", "c")
    val dir = Files.createTempDirectory("graft-kv-proj").toString
    src.repartitionByRange(4, col("k"))
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("overwrite").save()
    def read(columnar: Boolean) = spark.read.format("graft-kv")
      .option("catalog", cat).option("path", dir)
      .option("columnar", columnar.toString).load()
    val allCols = Seq("k", "s", "i", "d", "b", "c")
    val pivot = rows(137)
    // predicates referencing columns OUTSIDE the projection force the
    // wanted-cell set to differ from the projected set — the exact shape
    // parse-time value skipping must get right
    val preds: Seq[Option[Column]] = Seq(None, Some(col("i") >= pivot._3),
      Some(col("s") > pivot._2 || col("c").isNull), Some(col("d") <= pivot._4))
    for (_ <- 1 to 8; pred <- preds) {
      val proj = rnd.shuffle(allCols).take(1 + rnd.nextInt(allCols.length))
      def result(df: DataFrame): Seq[String] = {
        val filtered = pred.fold(df)(df.filter(_))
        filtered.select(proj.map(col): _*).collect().map(_.toString).sorted.toSeq
      }
      val expected = result(src)
      assert(result(read(columnar = true)) == expected,
        s"columnar proj $proj pred $pred diverged")
      assert(result(read(columnar = false)) == expected,
        s"row proj $proj pred $pred diverged")
    }
  }

  test("fuzz: DESC top-N tails agree across row and columnar readers") {
    // r19: reverse scans ride the columnar ring buffer; this is the
    // agreement fuzz extended to the tail shape — random tail widths ×
    // fully-pushable predicates (a residual filter would block the topN
    // pushdown upstream, so pushable predicates are the ring path)
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (0 until 400).map { j =>
      (j.toLong, randomString(rnd), rnd.nextInt(), randomDouble(rnd),
        rnd.nextBoolean(), if (rnd.nextBoolean()) null else randomString(rnd))
    }
    val src = rows.toDF("k", "s", "i", "d", "b", "c")
    val dir = Files.createTempDirectory("graft-kv-tail").toString
    src.repartitionByRange(4, col("k"))
      .write.format("graft-kv").option("catalog", cat).option("path", dir)
      .mode("overwrite").save()
    def read(columnar: Boolean) = spark.read.format("graft-kv")
      .option("catalog", cat).option("path", dir)
      .option("columnar", columnar.toString).load()
    val pivot = rows(61)
    val preds: Seq[Option[Column]] = Seq(None, Some(col("i") >= pivot._3),
      Some(col("c").isNull), Some(col("d") <= pivot._4))
    for (n <- Seq(1, 7, 64, 500); pred <- preds) {
      def tailOf(df: DataFrame): Seq[String] = pred.fold(df)(df.filter(_))
        .orderBy(col("k").desc).limit(n).collect().map(_.toString).toSeq
      val expected = tailOf(src)
      assert(tailOf(read(columnar = true)) == expected,
        s"columnar DESC tail n=$n pred $pred diverged")
      assert(tailOf(read(columnar = false)) == expected,
        s"row DESC tail n=$n pred $pred diverged")
    }
  }

  test("nested cells (array<float>, map<string,string>) agree across row and columnar readers") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { j =>
      val vec = if (rnd.nextInt(10) == 0) null
        else Array.fill(rnd.nextInt(5))(rnd.nextFloat()) // 0-length hits the empty edge
      val props = if (rnd.nextInt(10) == 0) null
        else (0 until rnd.nextInt(4)).map(i => s"k$i" -> randomString(rnd)).toMap
      (j.toLong, randomString(rnd), vec, props)
    }
    val src = rows.toDF("k", "s", "vec", "props")
    val nestedCat =
      """{"table":{"name":"nested_fuzz"},"rowkey":"k",
        | "columns":{
        |  "k":{"cf":"rowkey","col":"k","type":"long"},
        |  "s":{"cf":"f","col":"s","type":"string"},
        |  "vec":{"cf":"f","col":"v","type":"array<float>"},
        |  "props":{"cf":"f","col":"p","type":"map<string,string>"}}}""".stripMargin
    val dir = Files.createTempDirectory("graft-kv-nested").toString
    src.repartitionByRange(4, col("k"))
      .write.format("graft-kv").option("catalog", nestedCat).option("path", dir)
      .mode("overwrite").save()
    def read(columnar: Boolean) = spark.read.format("graft-kv")
      .option("catalog", nestedCat).option("path", dir)
      .option("columnar", columnar.toString).load()
    // canonical row image: sorted map entries (map iteration order is
    // not part of the contract), array as-is (order IS the contract)
    def canon(df: DataFrame, proj: Seq[String], pred: Option[Column]): Seq[String] = {
      val filtered = pred.fold(df)(df.filter(_))
      filtered.select(proj.map {
        case "props" => sort_array(map_entries(col("props"))).as("props")
        case c => col(c)
      }: _*).collect().map(_.toString).sorted.toSeq
    }
    val allCols = Seq("k", "s", "vec", "props")
    // predicates on the scalar columns only — nested cells aren't
    // pushable, but they must still decode right when the predicate
    // forces the wanted-cell set to differ from the projection
    val preds: Seq[Option[Column]] =
      Seq(None, Some(col("k") % 3 === 0), Some(col("s") > rows(50)._2))
    for (_ <- 1 to 6; pred <- preds) {
      val proj = rnd.shuffle(allCols).take(1 + rnd.nextInt(allCols.length))
      val expected = canon(src, proj, pred)
      // both paths must actually exercise: the nested columns are
      // columnar-eligible as of r17, so columnar=true is the batch path
      assert(canon(read(columnar = true), proj, pred) == expected,
        s"columnar nested proj $proj pred $pred diverged")
      assert(canon(read(columnar = false), proj, pred) == expected,
        s"row nested proj $proj pred $pred diverged")
    }
  }

  test("fuzz: every snapshot version replays its exact append prefix") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dir = Files.createTempDirectory("graft-kv-snapfuzz").toString
    var nextKey = 0L
    // history(v) = full expected row set right after the commit that
    // produced manifest version v
    val history = scala.collection.mutable.Map.empty[Long, Set[(Long, String, Int)]]
    var accumulated = Set.empty[(Long, String, Int)]
    (1 to 8).foreach { round =>
      val batch = (0 until 20 + rnd.nextInt(60)).map { _ =>
        nextKey += 1 + rnd.nextInt(3) // gaps: keys non-contiguous
        (nextKey, randomString(rnd), rnd.nextInt())
      }
      batch.toDF("k", "s", "i")
        .withColumn("d", lit(0.0)).withColumn("b", lit(true))
        .withColumn("c", lit(null).cast("string"))
        .select("k", "s", "i", "d", "b", "c")
        .repartitionByRange(2, col("k"))
        .write.format("graft-kv").option("catalog", cat).option("path", dir)
        .mode(if (round == 1) "overwrite" else "append").save()
      accumulated ++= batch
      history(graft.kv.KvStore.readMeta(dir).version) = accumulated
    }
    assert(history.size == 8, "each commit must mint a distinct version")
    history.foreach { case (v, expect) =>
      val got = spark.read.format("graft-kv")
        .option("catalog", cat).option("path", dir)
        .option("asOfVersion", v.toString).load()
        .select("k", "s", "i").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got == expect, s"version $v replayed ${got.size} rows, expected ${expect.size}")
      // pushdown against the pinned manifest stays consistent too
      val maxK = expect.map(_._1).max
      val cnt = spark.read.format("graft-kv")
        .option("catalog", cat).option("path", dir)
        .option("asOfVersion", v.toString).load()
        .filter(col("k") > maxK).count()
      assert(cnt == 0, s"version $v must not see keys appended after it")
    }
  }

  test("fuzz: bucket pruning never changes point-lookup results") {
    // bucket pruning silently DROPS shards at plan time — the scariest
    // way to be wrong is returning fewer rows than exist. Random point
    // sets (present, absent, mixed, huge IN lists) over a bucketed table
    // must return exactly what Spark computes on the original frame,
    // and what the same predicates return through an UNBUCKETED copy.
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val bcat =
      """{"table":{"name":"bfuzz"},"rowkey":"k",
        | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
        |            "v":{"cf":"f","col":"v","type":"long"}},
        | "buckets": 16}""".stripMargin
    val pcat =
      """{"table":{"name":"pfuzz"},"rowkey":"k",
        | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
        |            "v":{"cf":"f","col":"v","type":"long"}}}""".stripMargin
    // sparse adversarial keys: negatives, extremes, dense run, gaps
    val keys = (Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue) ++
      (0 until 400).map(_ => rnd.nextLong()) ++
      (1000L until 1100L)).distinct
    val df = keys.map(k => (k, k * 3)).toDF("k", "v")
    val bdir = Files.createTempDirectory("graft-bfuzz").toString
    val pdir = Files.createTempDirectory("graft-pfuzz").toString
    df.repartition(4).write.format("graft-kv")
      .option("catalog", bcat).option("path", bdir).mode("overwrite").save()
    df.repartition(4).write.format("graft-kv")
      .option("catalog", pcat).option("path", pdir).mode("overwrite").save()
    def readB = spark.read.format("graft-kv")
      .option("catalog", bcat).option("path", bdir).load()
    def readP = spark.read.format("graft-kv")
      .option("catalog", pcat).option("path", pdir).load()
    val keyArr = keys.toArray
    for (_ <- 1 to 12) {
      val probe: Seq[Long] = (0 until 1 + rnd.nextInt(40)).map { _ =>
        if (rnd.nextBoolean()) keyArr(rnd.nextInt(keyArr.length)) // present
        else rnd.nextLong()                                       // likely absent
      }.distinct
      val expect = keys.filter(probe.contains).map(k => (k, k * 3)).toSet
      def got(r: DataFrame) = r.filter(col("k").isin(probe: _*))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val b = got(readB)
      assert(b == expect,
        s"bucketed point lookup lost/invented rows: got ${b.size}, expected ${expect.size}")
      assert(got(readP) == expect, "unbucketed twin disagrees (harness bug)")
    }
    // and a mixed predicate (points OR a span) must not bucket-prune away
    // the span's rows
    val span = readB.filter(col("k").isin(1000L, 1050L) ||
      (col("k") >= 1060L && col("k") <= 1070L))
    assert(span.collect().map(_.getLong(0)).sorted.toSeq ==
      (Seq(1000L, 1050L) ++ (1060L to 1070L)).sorted)
  }

  test("fuzz: bucket pruning on STRING rowkeys (UTF8 key encoding) stays exact") {
    // the bucket hash runs over the order-preserving key ENCODING; string
    // keys exercise the variable-length path with adversarial unicode
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val scat =
      """{"table":{"name":"sbfuzz"},"rowkey":"k",
        | "columns":{"k":{"cf":"rowkey","col":"k","type":"string"},
        |            "v":{"cf":"f","col":"v","type":"long"}},
        | "buckets": 8}""".stripMargin
    val keys = ((0 until 300).map(_ => randomString(rnd)).filter(_.nonEmpty) ++
      Seq("a", " x", "�", "日本語キー", "🎯🎯")).distinct
    val dir = Files.createTempDirectory("graft-sbfuzz").toString
    keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
      .repartition(4).write.format("graft-kv")
      .option("catalog", scat).option("path", dir).mode("overwrite").save()
    val expectByKey = keys.zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
    val read = spark.read.format("graft-kv")
      .option("catalog", scat).option("path", dir).load()
    for (_ <- 1 to 8) {
      val probe = ((0 until 1 + rnd.nextInt(10))
        .map(_ => keys(rnd.nextInt(keys.length))) ++
        Seq(randomString(rnd) + "∉")).distinct // plus a guaranteed-absent key
      val got = read.filter(col("k").isin(probe: _*))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val expect = probe.flatMap(k => expectByKey.get(k).map(k -> _)).toSet
      assert(got == expect,
        s"string-rowkey bucket lookup mismatch: got ${got.size}, expected ${expect.size}")
    }
  }
}
