package graft.sources

import graft.kv.KvBuckets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The `bucket(numBuckets, col)` function [[KvSqlCatalog]] exports as a
  * `FunctionCatalog` entry — the resolution hook Spark's
  * storage-partitioned join needs: `V2ScanPartitioning` takes the
  * `bucket(n, rowkey)` transform a bucketed [[KvScan]] reports, loads
  * `bucket` from the table's function catalog
  * (`V2ExpressionUtils.loadV2FunctionOpt` — identifier with an EMPTY
  * namespace), binds it to `(int, keyType)`, and compares the bound
  * function's `canonicalName` across the two join sides to decide the
  * exchanges can be elided. The bound evaluation MUST equal the
  * writer's shard tagging ([[KvBuckets.ofKey]] over the
  * order-preserving key encoding) — Spark may evaluate it itself, e.g.
  * when padding partitions one side is missing.
  */
object KvBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) - graft-kv rowkey hash bucket (FNV-1a over the key encoding)"

  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2 || inputType.fields(0).dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"bucket expects (numBuckets INT, col), got ${inputType.catalogString}")
    val keyType = inputType.fields(1).dataType
    new KvBoundBucket(keyType)
  }
}

/** Bound form: canonicalName keys SPJ compatibility, so it embeds the
  * key type — two tables bucketed over different key types hash
  * different encodings and must never be declared co-partitioned even
  * with equal bucket counts. */
final class KvBoundBucket(keyType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.kv.bucket(${keyType.catalogString})"
  override def isResultNullable: Boolean = false
  override def toString: String = name()

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = input.get(1, keyType)
    if (v == null)
      // a null can never be a rowkey (writes reject it), but the
      // function must still be total for Spark-side evaluation
      0
    else KvBuckets.ofValue(keyType, v, n)
  }
}
