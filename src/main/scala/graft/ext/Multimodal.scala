package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: media as opaque binary columns with typed
  * metadata, decode/feature-extract as partition-local kernels.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape) is real;
  * the decode kernel is a STUB — a deterministic fake standing in for an
  * image/audio decoder, because the media libraries are not in this
  * container. Swap [[decodeStub]] for a real decoder (JNI/FFI) without
  * touching the dataflow.
  *
  * Scale design: records are repartitioned by `source` shard before the
  * decode pass so one executor core streams one shard's payloads
  * sequentially (decoder instances are per-partition, amortized via
  * mapPartitions); feature vectors come back as a typed column ready for
  * the ANN path (graft.ops.SimilarityOps).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, source: String, mime: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, source: String, n_bytes: Int,
      width: Int, height: Int, feature: Array[Float])

  /** Attach a binary payload column. In production this is the raw image/
    * audio bytes; here the document text bytes stand in. */
  def attachPayload(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"), col("source"),
      concat(lit("application/x-fake-"), col("lang")).as("mime"),
      col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decoder — deterministic fake "decode" of a payload into
    * dimensions + a 8-dim feature vector derived from byte statistics.
    * Replace with a real decoder; the signature (bytes in, fixed-width
    * features out) is the contract. */
  private[ext] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val feature = new Array[Float](8)
    var i = 0
    while (i < n) {
      feature(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (width, height, feature)
  }

  /** Decode pass: shard by source, then partition-local decode via
    * mapPartitions (one decoder per partition, not per row). */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .repartition(col("source"))
      .mapPartitions { it =>
        // per-partition decoder init would go here (expensive at per-row)
        it.map { r =>
          val (w, h, f) = decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.source, r.payload.length, w, h, f)
        }
      }
  }

  /** Full pipeline over the documents table: payload → shard → decode →
    * features joined back to metadata. */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    extractFeatures(attachPayload(docs)).toDF()
  }
}
