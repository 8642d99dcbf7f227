package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-published twin of MergeTable's physical bucket layout
  * (`pmod(xxhash64(key cols), n)`, seed 42): Spark resolves a scan's
  * `bucket(n, keys…)` transform against the owning catalog's
  * FunctionCatalog, and storage-partitioned join compatibility is
  * judged on the bound function's `canonicalName` — two scans
  * reporting `KeyGroupedPartitioning` over the SAME canonical bucket
  * function with equal argument lists co-locate without a shuffle.
  * `produceResult` replays the exact write-side hash so the
  * shuffle-one-side variants (`spark.sql.sources.v2.bucketing
  * .shuffle.enabled`) stay correct if enabled.
  */
object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, cols...): pmod(xxhash64(cols...), n) — mergetable hash-bucket id"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"bucket expects (int numBuckets, key cols...); got $inputType")
    GraftBucketBound(inputType.fields.map(_.dataType))
  }
}

case class GraftBucketBound(argTypes: Array[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = argTypes
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // seed-chained xxhash64 over the key columns, null-skipping —
    // byte-identical to functions.xxhash64 (the write side's
    // bucketExpr, MergeTable.scala:560)
    var h = 42L
    var i = 1
    while (i < argTypes.length) {
      val v = input.get(i, argTypes(i))
      if (v != null) h = XxHash64Function.hash(v, argTypes(i), h)
      i += 1
    }
    Int.box((((h % n) + n) % n).toInt)
  }
}
