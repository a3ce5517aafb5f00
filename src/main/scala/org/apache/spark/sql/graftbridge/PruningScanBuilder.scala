package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 ScanBuilder that FILE-PRUNES before the parquet stack ever
  * sees a path — the scan-planning half of the snapshot log's data
  * skipping, surfaced to SQL (Delta's DataSkippingReader idea at this
  * log's minimum).
  *
  * Lives in the bridge because the pushdown handshake Spark's own file
  * sources use is the `private[sql]` catalyst-expression variant
  * ([[SupportsPushDownCatalystFilters]]): V2ScanRelationPushDown hands
  * THAT interface the raw resolved predicates, which is exactly what
  * the prune callback needs (the public `SupportsPushDownFilters`
  * would work too, but Spark only consults it when the catalyst
  * variant is absent, and translating back and forth loses shapes).
  *
  * The contract keeps pruning an OPTIMIZATION, never semantics:
  * `pushFilters` returns every predicate as post-scan residual, so the
  * plan keeps its Filter node regardless of what the callback prunes —
  * a wrong (over-eager) prune could lose rows, which is why the
  * callback must only ever drop PROVABLY-dead files (the manifest
  * stats / bloom no-false-negatives direction); a too-timid prune
  * costs only I/O. At build() the kept files become an ordinary
  * [[ParquetTable]] scan, and the SAME predicates are re-pushed into
  * it, so parquet's own row-group skipping and the vectorized reader
  * operate inside the kept files exactly as they would have unpruned.
  * Column pruning is forwarded verbatim.
  */
class PruningParquetScanBuilder(
    spark: SparkSession,
    tableName: String,
    readSchema: StructType,
    prune: Seq[Expression] => Seq[String],
    mapName: String => String = identity,
    unmapName: String => String = identity)
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  private var filterExprs: Seq[Expression] = Nil
  private var required: Option[StructType] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    filterExprs = filters
    filters // ALL residual: pruning may only remove provably-dead I/O
  }

  // the inner parquet scan reports its own pushed filters in explain;
  // advertising none here keeps Spark's bookkeeping honest (nothing is
  // proven handled by this layer)
  override def pushedFilters(): Array[Predicate] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    // the prune callback speaks the CALLER's (logical) names; the inner
    // parquet stack speaks the file's (physical) names — on a
    // column-mapped table `mapName` translates column pruning and the
    // re-pushed predicates (attribute renames only: the inner builder's
    // own source-filter translation is name-based, so a renamed
    // attribute restores row-group pushdown that the pre-pruning
    // MappedTable wrapper had to give up), and `unmapName` renames the
    // scan's reported read schema back (rows are positional — the data
    // path is untouched, vectorized reader and all)
    val kept = prune(filterExprs)
    val inner = ParquetTable(
      tableName,
      spark,
      CaseInsensitiveStringMap.empty(),
      kept,
      userSpecifiedSchema = Some(readSchema),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    val physFilters = filterExprs.map(_.transform {
      case a: AttributeReference => a.withName(mapName(a.name))
    })
    inner.pushFilters(physFilters)
    required.foreach(r => inner.pruneColumns(
      StructType(r.fields.map(f => f.copy(name = mapName(f.name))))))
    val built = inner.build()
    val renamed = built.readSchema().fields.map(f =>
      f.copy(name = unmapName(f.name)))
    // identity tables return the parquet scan UNWRAPPED: the scan's
    // extra faces (SupportsReportStatistics feeding AQE/broadcast
    // sizing, runtime filtering) must stay visible to Spark. Only a
    // genuinely renamed schema pays for a forwarding wrapper — which
    // forwards estimateStatistics for the same reason.
    if (renamed.map(_.name).sameElements(built.readSchema().fieldNames)) built
    else new Scan with org.apache.spark.sql.connector.read.SupportsReportStatistics {
      override def readSchema(): StructType = StructType(renamed)
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        built.toBatch
      override def description(): String = built.description()
      override def estimateStatistics()
          : org.apache.spark.sql.connector.read.Statistics =
        built.estimateStatistics()
    }
  }
}
