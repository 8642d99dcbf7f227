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

/** The catalog-published twins of MergeTable's HIDDEN (derived)
  * partitioning transforms: `days(src)` / `months(src)` over a
  * zone-free TIMESTAMP_NTZ or DATE source render the day ("yyyy-MM-dd")
  * or month ("yyyy-MM") granule STRING — byte-identical to the
  * write-side derivation (`to_date(src).cast("string")` /
  * `date_format(src, "yyyy-MM")`, MergeTable.withDerived), which is
  * also the `_graft_p_…` dir value the Batch scan parses into its
  * partition keys. Two day-partitioned mergetable scans reporting
  * `KeyGroupedPartitioning(days(ts))` with this canonical function
  * storage-partition-join without a shuffle — the most common 100 TB
  * lake layout (date-partitioned facts) joining partition-for-
  * partition like identity layouts already do.
  */
sealed abstract class GraftGranuleUnbound(fn: String) extends UnboundFunction {
  override def name(): String = fn
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      (inputType.fields.head.dataType == TimestampNTZType ||
        inputType.fields.head.dataType == DateType),
      s"$fn expects one TIMESTAMP_NTZ/DATE column; got $inputType")
    GraftGranuleBound(fn, inputType.fields.head.dataType)
  }
}

object GraftDaysUnbound extends GraftGranuleUnbound("days") {
  override def description(): String =
    "days(ts): the 'yyyy-MM-dd' day granule — mergetable hidden day partition value"
}

object GraftMonthsUnbound extends GraftGranuleUnbound("months") {
  override def description(): String =
    "months(ts): the 'yyyy-MM' month granule — mergetable hidden month partition value"
}

case class GraftGranuleBound(fn: String, srcType: DataType)
    extends ScalarFunction[org.apache.spark.unsafe.types.UTF8String] {
  override def inputTypes(): Array[DataType] = Array(srcType)
  override def resultType(): DataType = StringType
  override def name(): String = fn
  override def canonicalName(): String = s"graft.$fn"
  override def produceResult(input: InternalRow): org.apache.spark.unsafe.types.UTF8String = {
    if (input.isNullAt(0)) return null
    org.apache.spark.unsafe.types.UTF8String.fromString(
      GraftGranule.render(srcType, input.get(0, srcType), fn == "months"))
  }
}

/** The ONE rendering of a zone-free timestamp/date to its day/month
  * granule string — shared by the FunctionCatalog transform, the v2
  * writer's executor-side derived-partition routing, and (by
  * construction) byte-identical to the V1 write path's
  * `to_date(src).cast("string")` / `date_format(src, "yyyy-MM")`.
  */
object GraftGranule {
  /** The catalog transform of one declared partition column — THE one
    * dispatch rule (identity for value partitioning, days/months over
    * the source for hidden layouts; the granularity is carried by the
    * derived column's name suffix, fixed at CREATE). Shared by the
    * scan's reported partitioning and both write paths' required
    * distributions, so they can never drift apart.
    */
  def transformOf(derived: Map[String, String],
      c: String): org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    derived.get(c) match {
      case Some(src) if c.endsWith("_month") => Expressions.months(src)
      case Some(src) => Expressions.days(src)
      case None => Expressions.identity(c)
    }
  }

  /** `v` is the catalyst value: epoch days (DATE) or zone-free epoch
    * micros (TIMESTAMP_NTZ).
    */
  /** Year rendered exactly like Spark's DateFormatter (java.time
    * SignStyle.EXCEEDS_PAD): 4-digit zero-pad inside 0–9999, a '+'
    * prefix beyond ("+10000"), a sign-then-pad for negatives
    * ("-0001") — so v2 executor-derived granule dirs can never
    * diverge from V1's `to_date(src).cast("string")` dirs, even for
    * extreme timestamps (a divergence would split one logical
    * partition across two leaf dirs).
    */
  private def isoYear(y: Int): String =
    if (y > 9999) s"+$y" else if (y < 0) f"-${-y}%04d" else f"$y%04d"

  def render(srcType: DataType, v: Any, monthly: Boolean): String = {
    val day = srcType match {
      case DateType => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
      case _ => java.time.LocalDate.ofEpochDay(
        Math.floorDiv(v.asInstanceOf[Long], 86400000000L))
    }
    if (monthly) f"${isoYear(day.getYear)}-${day.getMonthValue}%02d"
    else f"${isoYear(day.getYear)}-${day.getMonthValue}%02d-${day.getDayOfMonth}%02d"
  }
}
