package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters,
  SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
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
  *    hence `isPartiallyPushed`);
  *  - FILTER pushdown via SupportsPushDownFilters: doc_id comparisons
  *    narrow the generated id range itself (pruned ids are never
  *    materialized — the generator analog of partition pruning), and
  *    lang equality/membership is tested in the reader BEFORE text
  *    generation; both exact, so Spark plans no post-scan re-filter;
  *  - MICRO_BATCH_READ via [[DocGenMicroBatchStream]]: the same id
  *    space admitted `rowsPerBatch` ids per trigger — offsets are row
  *    counts, and determinism makes every offset range replayable, so
  *    `spark.readStream.format("graft-docs")` drives the full DSv2
  *    streaming path (Offset/planInputPartitions/commit) with rows
  *    byte-identical to the batch read (DocGenSpec).
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
  * 1000 distinct tokens), dupEvery (default 0 = off: every dupEvery-th
  * row is a ~6%-mutated near-duplicate of its predecessor — a
  * linear-in-N planted near-dup population for dedup studies),
  * langMarkers (default false: every 8th token is a stopword matching
  * the row's lang and the TextOps langid heuristic, so language-ID,
  * stop-ratio quality gates, and the curation pipeline are
  * non-vacuous on generated corpora).
  */
class DocGenProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocGenTable(new CaseInsensitiveStringMap(properties))
}

private[graft] object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val langs: Array[String] = Array("en", "de", "fr", "es", "zh")
  val sources: Array[String] = Array("web", "books", "code", "wiki")

  /** Language-marker stopwords matching the TextOps langid heuristic
    * (en the/a/of, de der/die, fr le/la); es/zh carry their own
    * articles, which langid deliberately does NOT know — generated
    * docs in those languages classify `und`, exercising the
    * unknown-language drop path of the curation gates. */
  val markerWords: Map[String, Array[String]] = Map(
    "en" -> Array("the", "a", "of"), "de" -> Array("der", "die"),
    "fr" -> Array("le", "la"), "es" -> Array("el", "los"),
    "zh" -> Array("zh1", "zh2"))

  def lang(seed: Long, docId: Long): String =
    langs((java.lang.Long.remainderUnsigned(mix(seed ^ ~docId), 5L)).toInt)

  /** SplitMix64 — the standard 64-bit mix; pure function of the input. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** When dupEvery > 0, every dupEvery-th doc is a NEAR-DUPLICATE of
    * its predecessor: same token stream with every 16th token
    * substituted (~6% mutation — above exact-dup, inside every
    * near-dup family's detection range). Still a pure function of
    * (seed, docId): the dup doc re-derives its base's stream from
    * (seed, docId-1), so partition invariance is untouched and the
    * dup population is exactly linear in N — what a dedup growth
    * study needs (a FIXED dup pool would densify quadratically). */
  def text(seed: Long, docId: Long, minTok: Int, maxTok: Int, vocab: Int,
      dupEvery: Int = 0, langMarkers: Boolean = false): String = {
    val isDup = dupEvery > 0 && docId % dupEvery == (dupEvery - 1).toLong && docId > 0
    val baseId = if (isDup) docId - 1 else docId
    val h0 = mix(seed ^ mix(baseId))
    val n = minTok + (java.lang.Long.remainderUnsigned(h0, (maxTok - minTok + 1).toLong)).toInt
    val hMut = mix(seed ^ mix(docId) ^ 0x5d09e962L)
    // markers derive from the BASE doc so a near-dup twin keeps its
    // base's language signal (the realistic case)
    val marks = if (langMarkers) markerWords(lang(seed, baseId)) else null
    val sb = new java.lang.StringBuilder(n * 7)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      if (marks != null && i % 8 == 7)
        sb.append(marks((java.lang.Long.remainderUnsigned(mix(h0 - i), marks.length.toLong)).toInt))
      else {
        // mutation sites (i % 16 == 12) are chosen OFF the marker grid
        // (i % 8 == 7) so a near-dup twin still differs when markers are on
        val t =
          if (isDup && i % 16 == 12)
            java.lang.Long.remainderUnsigned(mix(hMut + i), vocab.toLong)
          else java.lang.Long.remainderUnsigned(mix(h0 + i + 1), vocab.toLong)
        sb.append("tok").append(t)
      }
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
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new DocGenScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private class DocGenScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var required: StructType = DocGen.schema
  private var limit: Int = -1
  private var idLo: Long = Long.MinValue
  private var idHi: Long = Long.MaxValue // exclusive
  private var langSet: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty
  private var countStarPushed = false

  /** COMPLETE COUNT(*) pushdown: a generated table's ungrouped row
    * count is a CLOSED FORM of its definition — max(0, hi−lo) after
    * the pushed doc_id range — so the "aggregate" is O(1) arithmetic
    * and the scan materializes NOTHING (the aggregate-pushdown analog
    * of parquet's footer-count shortcut, which Spark only gets from
    * file sources; a metadata-aware DSv2 source can do the same).
    * Only the exactly-computable case is claimed: ungrouped COUNT(*)
    * with no lang filter (lang is a per-row function of the id — a
    * lang-filtered count would need the row pass the pushdown exists
    * to avoid) and no pushed limit. Everything else declines and runs
    * as a normal scan + aggregate. */
  private def canPushCount(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    langSet.isEmpty && limit < 0 &&
      agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    canPushCount(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!canPushCount(agg)) false
    else { countStarPushed = true; true }
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true // per-partition cap only

  /** doc_id comparisons narrow the GENERATED id range (the scan never
    * materializes pruned ids at all); lang equality/membership is
    * evaluated in the reader BEFORE text generation, the dominant
    * per-row cost. Both are exact, so nothing accepted here needs
    * post-scan re-evaluation. */
  // saturating v+1: at Long.MaxValue a naive +1 wraps to MinValue and
  // an ACCEPTED bound (which Spark therefore drops from its own plan)
  // silently inverts the range — the pushed COUNT would return 0 for a
  // predicate matching everything
  private def succ(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("doc_id", v: Long) => idLo = math.max(idLo, v); idHi = math.min(idHi, succ(v)); true
      case GreaterThan("doc_id", v: Long) => idLo = math.max(idLo, succ(v)); true
      case GreaterThanOrEqual("doc_id", v: Long) => idLo = math.max(idLo, v); true
      case LessThan("doc_id", v: Long) => idHi = math.min(idHi, v); true
      case LessThanOrEqual("doc_id", v: Long) => idHi = math.min(idHi, succ(v)); true
      case EqualTo("lang", v: String) =>
        langSet = Some(langSet.getOrElse(Set.empty[String] ++ DocGen.langs).intersect(Set(v))); true
      case In("lang", vs) if vs.forall(_.isInstanceOf[String]) =>
        langSet = Some(langSet.getOrElse(Set.empty[String] ++ DocGen.langs)
          .intersect(vs.map(_.asInstanceOf[String]).toSet)); true
      case IsNotNull("doc_id") | IsNotNull("lang") => true // nothing is null here
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (countStarPushed) new DocGenCountScan(options, idLo, idHi)
    else new DocGenScan(options, required, limit, idLo, idHi, langSet)
}

/** The scan a completely-pushed COUNT(*) builds: one partition, one
  * row, zero document generation — the count is closed-form from the
  * (filter-narrowed) generated range. Its schema IS the aggregation
  * output (one non-null BIGINT; Spark maps it positionally). */
private class DocGenCountScan(options: CaseInsensitiveStringMap,
    idLo: Long, idHi: Long) extends Scan with Batch {
  private val n = options.getLong("n", 1000L)
  private val count = math.max(0L, math.min(n, idHi) - math.max(0L, idLo))
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs(COUNT(*) pushed = $count)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    DocGenCountReaderFactory(count)
}

private case class DocGenCountReaderFactory(count: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](count))
      override def close(): Unit = ()
    }
}

private class DocGenScan(options: CaseInsensitiveStringMap,
    required: StructType, limit: Int,
    idLo: Long = Long.MinValue, idHi: Long = Long.MaxValue,
    langSet: Option[Set[String]] = None) extends Scan with Batch {
  private val n = options.getLong("n", 1000L)
  private val parts = options.getInt("partitions", 32)
  private val seed = options.getLong("seed", 42L)
  private val minTok = options.getInt("mintokens", 40)
  private val maxTok = options.getInt("maxtokens", 80)
  private val vocab = options.getInt("vocab", 1000)
  private val dupEvery = options.getInt("dupevery", 0)
  private val langMarkers = options.getBoolean("langmarkers", false)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DocGenMicroBatchStream(n, options.getLong("rowsperbatch", 1000L),
      parts, seed, minTok, maxTok, vocab, dupEvery, required, langMarkers, langSet)
  override def description(): String =
    s"graft-docs(n=$n, seed=$seed, cols=${required.fieldNames.mkString(",")}" +
      (if (idLo != Long.MinValue || idHi != Long.MaxValue) s", ids=[$idLo,$idHi)" else "") +
      langSet.map(s => s", langs=${s.toSeq.sorted.mkString("|")}").getOrElse("") + ")"

  override def planInputPartitions(): Array[InputPartition] = {
    // pushed doc_id bounds narrow the generated range itself
    val lo0 = math.max(0L, idLo)
    val hi0 = math.min(n, idHi)
    val rows = math.max(0L, hi0 - lo0)
    if (rows == 0) return Array.empty
    val k = math.max(1L, math.min(parts.toLong, rows)).toInt
    (0 until k).map { i =>
      DocGenPartition(lo0 + rows * i / k, lo0 + rows * (i + 1) / k): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required, seed, minTok, maxTok, vocab, limit, dupEvery,
      langMarkers, langSet)
}

private case class DocGenPartition(lo: Long, hi: Long) extends InputPartition

/** Offset = the count of rows already emitted; a micro-batch is the id
  * range [start, end). Because row content is a pure function of
  * (seed, doc_id), replaying any offset range after a restart yields
  * byte-identical rows — exactly the replayable-source contract
  * Structured Streaming's WAL expects (the same property a Kafka
  * offset range or a file-source file list provides). */
private class DocGenOffset(val pos: Long) extends Offset {
  override def json: String = pos.toString
}

/** MicroBatchStream over the generator: admission is `rowsPerBatch`
  * ids per trigger until `n` is exhausted; each batch is split into
  * (up to) `parts` range partitions read by the SAME reader factory as
  * the batch path — the streaming surface adds offset bookkeeping, not
  * a second generator. */
private class DocGenMicroBatchStream(n: Long, rowsPerBatch: Long, parts: Int,
    seed: Long, minTok: Int, maxTok: Int, vocab: Int, dupEvery: Int,
    required: StructType, langMarkers: Boolean = false,
    langSet: Option[Set[String]] = None) extends MicroBatchStream {

  private var planned = 0L // high-water mark this run; replay-safe (see DocGenOffset)

  override def initialOffset(): Offset = new DocGenOffset(0L)

  override def latestOffset(): Offset = {
    planned = math.min(n, planned + math.max(1L, rowsPerBatch))
    new DocGenOffset(planned)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (lo, hi) = (start.asInstanceOf[DocGenOffset].pos, end.asInstanceOf[DocGenOffset].pos)
    val rows = hi - lo
    if (rows <= 0) return Array.empty
    val k = math.max(1L, math.min(parts.toLong, rows)).toInt
    (0 until k).map { i =>
      DocGenPartition(lo + rows * i / k, lo + rows * (i + 1) / k): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required, seed, minTok, maxTok, vocab, -1, dupEvery,
      langMarkers, langSet)

  override def deserializeOffset(json: String): Offset = {
    val p = new DocGenOffset(json.toLong)
    planned = math.max(planned, p.pos) // resume past the checkpoint
    p
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private class DocGenReaderFactory(required: StructType, seed: Long,
    minTok: Int, maxTok: Int, vocab: Int, limit: Int, dupEvery: Int,
    langMarkers: Boolean = false, langSet: Option[Set[String]] = None)
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
        // pushed lang filter: skip BEFORE generating text (the
        // dominant per-row cost) — exact, no post-scan re-evaluation
        while (id < p.hi && langSet.exists(s => !s.contains(DocGen.lang(seed, id))))
          id += 1
        if (id >= p.hi || (limit >= 0 && emitted >= limit)) return false
        // text is the expensive field: generate it only when the scan
        // schema asks for text or for n_chars (which derives from it)
        val txt = if (wantText || wantChars)
          DocGen.text(seed, id, minTok, maxTok, vocab, dupEvery, langMarkers) else null
        val values = required.fieldNames.map {
          case "doc_id" => id
          case "text" => UTF8String.fromString(txt)
          case "lang" => UTF8String.fromString(DocGen.lang(seed, id))
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
