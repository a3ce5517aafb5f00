package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The catalog's `bucket` function — the V2 identity of the layout
  * [[SnapshotLog.rebucket]] writes, and the half of storage-
  * partitioned joins Spark asks the FunctionCatalog for: when a scan
  * reports `KeyGroupedPartitioning(bucket(n, col))`, the planner
  * resolves `bucket` through the table's catalog
  * (V2ExpressionUtils.loadV2FunctionOpt → `loadFunction(Identifier.of(
  * empty, "bucket"))`) and joins two scans shuffle-free exactly when
  * both sides' bound functions agree on [[BoundFunction.canonicalName]]
  * and numBuckets — which is why the canonical name CARRIES THE INPUT
  * TYPE: murmur3 hashes an int and a long to different values, so
  * `bucket(8, int_col)` and `bucket(8, bigint_col)` must never read
  * as co-partitioned even when the values are numerically equal.
  *
  * The arithmetic is Spark's own hash partitioning —
  * `pmod(murmur3(value, seed 42), n)`, null hashing to the seed —
  * because the write side IS `df.repartition(n, col)` (the file's
  * task-partition index is its bucket id; see [[SnapshotLog.rebucket]]).
  * [[ScalarFunction.produceResult]] replays it exactly; Spark only
  * calls it in the advanced SPJ modes (partially-clustered
  * distribution, pushed partition values), the basic no-shuffle join
  * needs only the identity. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, seed 42), n) — Spark's " +
      "hash-partitioning id; the layout SnapshotLog.rebucket writes"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket wants (numBuckets INT, column, ...), got $inputType")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        s"${inputType.fields(0).dataType}")
    BoundBucket(inputType.fields.drop(1).map(_.dataType).toSeq)
  }
}

case class BoundBucket(dts: Seq[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    (IntegerType +: dts).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false
  override def canonicalName(): String =
    s"graft.bucket(${dts.map(_.catalogString).mkString(",")})"
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // the exact HashExpression fold repartition(n, cols…) evaluates:
    // seed 42, each non-null column's murmur3 feeds the next column's
    // seed, null columns leave the running hash unchanged
    var h = 42L
    var i = 0
    while (i < dts.length) {
      if (!input.isNullAt(i + 1))
        h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(input.get(i + 1, dts(i)), dts(i), h)
      i += 1
    }
    val hi = h.toInt
    ((hi % n) + n) % n
  }
}
