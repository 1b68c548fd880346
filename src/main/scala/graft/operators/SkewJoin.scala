package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper: salt the hot side, replicate the small
  * side across salts, join on (key, salt).
  *
  * At 100 TB a single hot key (a null-ish default id, a bot user) can
  * put one shuffle partition hours behind the rest. AQE's skew-join
  * splitter handles sort-merge cases; explicit salting remains the tool
  * when the build side is broadcast-sized or the skew is extreme. The
  * salt must distribute ROWS of the same hot key across buckets, so it
  * cannot be a function of the key alone — spark_partition_id ⊕ a
  * per-row hash keeps it deterministic under task retries (it depends
  * only on partition contents, not scheduling order).
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small`, salted `nSalts`
    * ways. Result equals `big.join(small, keys, "inner")`.
    *
    * The salt hashes `spark_partition_id()` TOGETHER with the row
    * contents: a hot key's rows are often full duplicates (the classic
    * null-ish default-id case), and a content-only hash would land every
    * duplicate in one bucket — exactly the skew salting exists to break.
    * Partition id spreads duplicates by their physical placement while
    * staying deterministic under task retries (a retried task re-reads
    * the same partition id and contents). */
  /** The salt assignment for `df`'s rows (exposed for testability). */
  def saltExpr(df: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(spark_partition_id() +: df.columns.map(col).toIndexedSeq: _*),
      lit(nSalts)).cast("int")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", saltExpr(big, nSalts))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(key) === replicatedSmall(key) &&
          saltedBig("_salt") === replicatedSmall("_salt"))
      .drop(replicatedSmall(key))
      .drop("_salt")
  }
}
