package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a Catalyst
  * `TypedImperativeAggregate` — the bounded-memory candidate generator
  * for heavy-hitter queries (`mg_sketch(token, k)` → map<token,long>
  * of ≤ k candidates with lower-bound counts).
  *
  * Why this shape at 100 TB: the exact `groupBy(token)` heavy-hitter
  * plan shuffles the full distinct vocabulary; on a web-scale corpus
  * that vocabulary (typos, URLs, hashes) is unbounded. The MG summary
  * keeps exactly k counters per partition, the partial-aggregate
  * shuffle moves ONE ≤k-entry sketch per partition, and the merged
  * candidate set provably contains every token with true frequency
  * > N/(k+1) (Misra & Gries 1982; merge per Agarwal et al.,
  * "Mergeable Summaries", PODS'12). A second exact-recount pass over
  * only the candidates then makes the final answer exact — so the
  * catalog entry (`text_heavy_hitters_mg`) is deterministic and
  * oracle-checkable even though the intermediate candidate set depends
  * on partitioning.
  *
  * Estimates are LOWER bounds: true − estimate ≤ (N − Σestimates)/(k+1)
  * ≤ N/(k+1) — pinned as an executable property in MgSketchSpec, per
  * the round-7 lesson that hash-parity gates cannot catch a biased
  * sketch (both engines would compute the same wrong number).
  *
  * Buffer is a mutable token→count map; `shrink` implements the
  * summary-merge rule (subtract the (k+1)-th largest count, drop ≤0),
  * which is the classic decrement-all when exactly one over budget.
  */
case class MgSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "mg_sketch budget k must be positive")

  override def prettyName: String = "mg_sketch"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mg_sketch requires a string column, got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  /** Subtract the (k+1)-th largest count from everything and drop the
    * non-positive remainder — a no-op while ≤ k entries. */
  private def shrink(buf: mutable.HashMap[UTF8String, Long]): Unit = {
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val dec = counts(counts.length - (k + 1)) // (k+1)-th largest
      buf.filterInPlace((_, c) => c - dec > 0)
      buf.mapValuesInPlace((_, c) => c - dec)
    }
  }

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val raw = v.asInstanceOf[UTF8String]
      buf.get(raw) match {
        case Some(c) => buf.update(raw, c + 1L)
        case None =>
          // clone: the incoming UTF8String may point into a reused
          // UnsafeRow buffer; storing it un-copied corrupts the map
          buf.update(raw.clone(), 1L)
          shrink(buf)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    shrink(b1)
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic iteration order for a given buffer content
    val entries = buf.toArray.sortBy(_._1.toString)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgSketch =
    copy(child = newChild)
}
