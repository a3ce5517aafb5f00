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
    * features out) is the contract.
    *
    * Numeric-parity discipline (graft.ops.Tables): per-position byte
    * sums accumulate as EXACT integers and divide by 255.0 once at the
    * end — a float-accumulation loop would make the feature values
    * depend on summation order and unreproducible outside the JVM,
    * which matters now that the `multimodal_ann` catalog entry mirrors
    * this stub in the DuckDB oracle. */
  private[ext] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val acc = new Array[Long](8)
    var i = 0
    while (i < n) {
      acc(i % 8) += (payload(i) & 0xff)
      i += 1
    }
    val feature = Array.tabulate(8)(j => (acc(j) / 255.0).toFloat)
    (width, height, feature)
  }

  case class FrameSample(
      doc_id: Long, frame_idx: Int, n_frames: Int, frame_n_bytes: Int, checksum: Long)
  case class ResizedMedia(doc_id: Long, n_bytes: Int, resized_checksum: Long)

  /** Frame sampling — the video half of the decode contract: a payload
    * is read as consecutive fixed-size frames (trailing partial frame
    * dropped, exactly what a fixed-GOP reader does) and every
    * `everyNth`-th frame is emitted as its OWN ROW with an
    * integer-exact checksum standing in for the decoded frame. The
    * Spark mechanics are the real deliverable: a 1→N flatMap inside
    * the source-sharded mapPartitions kernel (per-partition decoder
    * init, not per-row; same contract as [[extractFeatures]]), with
    * the output row count a function of payload sizes — the shape a
    * video-pretraining reader fans out at 100 TB. The stub checksum
    * keeps the whole fan-out DuckDB-expressible, so the catalog entry
    * checks frame boundaries, sampling arithmetic, and per-frame byte
    * sums exactly. */
  def sampleFrames(records: Dataset[MediaRecord],
      frameBytes: Int = 64, everyNth: Int = 2): Dataset[FrameSample] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .repartition(col("source"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val nFrames = r.payload.length / frameBytes
          (0 until nFrames).iterator.filter(_ % everyNth == 0).map { fi =>
            var sum = 0L
            var i = fi * frameBytes
            val end = i + frameBytes
            while (i < end) { sum += (r.payload(i) & 0xff); i += 1 }
            FrameSample(r.doc_id, fi, nFrames, frameBytes, sum)
          }
        }
      }
  }

  /** Resize — the image half, as a stub with honest semantics:
    * nearest-neighbor downsample of the byte stream to `targetBytes`
    * samples (index k reads source byte ⌊k·n/target⌋ — shorter
    * payloads upsample by repetition, the nearest-neighbor convention).
    * Integer-exact output (the resized stream's checksum), so the
    * catalog entry pins the index mapping against the oracle; swap
    * [[resizeStub]] for a real scaler and the pipeline shape —
    * source-sharded mapPartitions, fixed-width output — is unchanged. */
  private[ext] def resizeStub(payload: Array[Byte], targetBytes: Int): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val n = payload.length
    var sum = 0L
    var k = 0
    while (k < targetBytes) {
      sum += (payload((k.toLong * n / targetBytes).toInt) & 0xff)
      k += 1
    }
    sum
  }

  def resizeAll(records: Dataset[MediaRecord],
      targetBytes: Int = 64): Dataset[ResizedMedia] = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .repartition(col("source"))
      // empty payloads have no byte to nearest-neighbor from — skipped
      // on BOTH engines (the oracle's WHERE n > 0), never crashed on
      .filter(_.payload.nonEmpty)
      .mapPartitions(_.map(r =>
        ResizedMedia(r.doc_id, r.payload.length, resizeStub(r.payload, targetBytes))))
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

  /** ANN over the extracted feature column — the wiring that closes the
    * multimodal loop: decode output feeds the same bucketed similarity
    * join the embedding path uses (graft.ops.SimilarityOps /
    * DedupOps.dedupEmbeddingLsh shape: equi-join on an LSH bucket key,
    * cosine only within a bucket, per-item top-k window).
    *
    * Media features are non-negative (intensity sums), so raw sign-bit
    * LSH would put every vector in one bucket; the bucket bits are sign
    * bits of MEAN-CENTERED dimensions instead (hyperplanes through the
    * centroid). The per-dimension means are one tiny 1-row aggregate,
    * broadcast to the scan — no extra shuffle of the feature table.
    *
    * The `bits` default is the documented SCALE policy (≥8 → ≥256
    * buckets), not a test convenience: defaults are the API users copy,
    * and a 16-bucket default would make every per-bucket join
    * quadratic-ish on a real corpus. Check the choice against
    * [[featureBucketOccupancy]] — the same occupancy-before-it-hurts
    * observable the embedding path has — and grow bits with the corpus
    * exactly as documented on dedupEmbeddingLsh. `bits` is capped by
    * the feature dimensionality (axis-aligned hyperplanes, one per
    * leading dimension).
    */
  def nearestNeighbors(features: DataFrame, bits: Int = 8, k: Int = 3): DataFrame = {
    val spark = features.sparkSession
    val dot = graft.ops.Tables.dotSql(spark, "a.v", "b.v")
    val bucketed = bucketedFeatures(features, bits)
    val scored = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("qid"), col("b.doc_id").as("nid"),
        col("a.bucket").as("bucket"),
        round(expr(dot) / (col("a.norm") * col("b.norm")), 6).as("cos6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos6").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Mean-centered sign-bit bucketing of the feature column — shared by
    * [[nearestNeighbors]] and [[featureBucketOccupancy]]. */
  private def bucketedFeatures(features: DataFrame, bits: Int): DataFrame = {
    val spark = features.sparkSession
    val selfDot = graft.ops.Tables.dotSql(spark, "v", "v")
    val vecs = features.select(col("doc_id"),
      expr("transform(feature, x -> cast(x as double))").as("v"))
    // means rounded to 6 decimals: an avg over a shuffled double column
    // is summation-order-dependent at the last ulps, and the bucket bit
    // is a >= comparison against it — round-6 (the project's standing
    // discipline for accumulated floats) pins the hyperplane across
    // runs and engines without moving it meaningfully
    val means = vecs.select((0 until bits).map(i =>
      round(avg(expr(s"v[$i]")), 6).as(s"m$i")): _*)
    vecs.crossJoin(broadcast(means))
      .withColumn("norm", expr(s"sqrt($selfDot)"))
      .withColumn("bucket", concat((0 until bits).map(i =>
        when(expr(s"v[$i]") >= col(s"m$i"), "1").otherwise("0")): _*))
      .select("doc_id", "v", "norm", "bucket")
  }

  /** Bucket-occupancy distribution for the media-feature LSH — the
    * observability twin of `embedding_lsh_occupancy`: per occupancy
    * level n_docs, how many buckets hold that many vectors. A skewed
    * bucket (the one that would dominate the per-bucket join at scale)
    * shows up here as a high-n_docs row BEFORE the join is run, which
    * is when the `bits` policy gets adjusted. */
  def featureBucketOccupancy(features: DataFrame, bits: Int = 8): DataFrame =
    bucketedFeatures(features, bits)
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .groupBy("n_docs").agg(count(lit(1)).as("n_buckets"))
}
