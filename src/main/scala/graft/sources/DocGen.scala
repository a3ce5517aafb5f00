package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2: a deterministic synthetic-document generator —
  * `spark.read.format("graft-docs").option("n", 1000000).load()` yields
  * the `documents` schema (doc_id, text, lang, source, n_chars) with no
  * disk behind it, so operator scale experiments aren't bounded by what
  * the host can materialize (the ScaleReplicas study caps at 10×
  * because replicas live on disk; this source generates any N in
  * parallel, same rows every run for a given seed).
  *
  * Engine mechanics exercised (the full DSv2 read path):
  *  - TableProvider → Table(SupportsRead) → ScanBuilder → Scan → Batch
  *    → InputPartition/PartitionReaderFactory/PartitionReader;
  *  - COLUMN PRUNING via SupportsPushDownRequiredColumns: the reader
  *    materializes only requested fields — pruning `text` skips token
  *    generation entirely, the dominant cost (DocGenSpec measures the
  *    pruned ReadSchema, mirroring the parquet pushdown guard);
  *  - partial LIMIT pushdown via SupportsPushDownLimit: each partition
  *    stops after `limit` rows (Spark still applies the global limit —
  *    hence `isPartiallyPushed`).
  *
  * Determinism: row content is a pure function of (seed, doc_id) via
  * SplitMix64 — no RNG state shared across rows or partitions, so any
  * partitioning of the id range yields identical rows (spec-pinned).
  * Generation is synthetic-data tooling, NOT the dedup hash family —
  * operators hashing these rows still use md5 (NOTES_r1 parity rules
  * don't apply to inputs, only to query outputs).
  *
  * Options: n (rows, default 1000), partitions (default 32), seed
  * (default 42), minTokens/maxTokens (default 40/80), vocab (default
  * 1000 distinct tokens).
  */
class DocGenProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocGenTable(new CaseInsensitiveStringMap(properties))
}

private[sources] object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val langs: Array[String] = Array("en", "de", "fr", "es", "zh")
  val sources: Array[String] = Array("web", "books", "code", "wiki")

  /** SplitMix64 — the standard 64-bit mix; pure function of the input. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def text(seed: Long, docId: Long, minTok: Int, maxTok: Int, vocab: Int): String = {
    val h0 = mix(seed ^ mix(docId))
    val n = minTok + (java.lang.Long.remainderUnsigned(h0, (maxTok - minTok + 1).toLong)).toInt
    val sb = new java.lang.StringBuilder(n * 7)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      val t = java.lang.Long.remainderUnsigned(mix(h0 + i + 1), vocab.toLong)
      sb.append("tok").append(t)
      i += 1
    }
    sb.toString
  }
}

private class DocGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_docs_gen"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new DocGenScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private class DocGenScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = DocGen.schema
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true // per-partition cap only

  override def build(): Scan = new DocGenScan(options, required, limit)
}

private class DocGenScan(options: CaseInsensitiveStringMap,
    required: StructType, limit: Int) extends Scan with Batch {
  private val n = options.getLong("n", 1000L)
  private val parts = options.getInt("partitions", 32)
  private val seed = options.getLong("seed", 42L)
  private val minTok = options.getInt("mintokens", 40)
  private val maxTok = options.getInt("maxtokens", 80)
  private val vocab = options.getInt("vocab", 1000)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs(n=$n, seed=$seed, cols=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val k = math.max(1, math.min(parts.toLong, n)).toInt
    (0 until k).map { i =>
      val lo = n * i / k
      val hi = n * (i + 1) / k
      DocGenPartition(lo, hi): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required, seed, minTok, maxTok, vocab, limit)
}

private case class DocGenPartition(lo: Long, hi: Long) extends InputPartition

private class DocGenReaderFactory(required: StructType, seed: Long,
    minTok: Int, maxTok: Int, vocab: Int, limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.lo
      private var emitted = 0
      private var row: InternalRow = _
      private val wantText = required.fieldNames.contains("text")
      private val wantChars = required.fieldNames.contains("n_chars")

      override def next(): Boolean = {
        if (id >= p.hi || (limit >= 0 && emitted >= limit)) return false
        // text is the expensive field: generate it only when the scan
        // schema asks for text or for n_chars (which derives from it)
        val txt = if (wantText || wantChars)
          DocGen.text(seed, id, minTok, maxTok, vocab) else null
        val values = required.fieldNames.map {
          case "doc_id" => id
          case "text" => UTF8String.fromString(txt)
          case "lang" => UTF8String.fromString(
            DocGen.langs((java.lang.Long.remainderUnsigned(DocGen.mix(seed ^ ~id), 5L)).toInt))
          case "source" => UTF8String.fromString(
            DocGen.sources((java.lang.Long.remainderUnsigned(DocGen.mix(seed + id), 4L)).toInt))
          case "n_chars" => txt.length.toLong
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        id += 1
        emitted += 1
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
