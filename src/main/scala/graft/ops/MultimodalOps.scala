package graft.ops

import org.apache.spark.sql.functions._

import Tables._

/** Multimodal-column plumbing, SQL-checkable slice.
  *
  * Real multimodal pipelines treat image/audio/video as opaque binary
  * columns plus typed metadata; the decode/feature kernels live in
  * [[graft.ext.Multimodal]] (mapPartitions with a deterministic stub
  * decoder — the media libs aren't in this container). What the oracle
  * can verify is the Spark-side plumbing: binary payloads, byte lengths,
  * header sniffing, batch shapes.
  */
object MultimodalOps {

  /** Binary payload metadata: byte length + 4-byte header hex. */
  val multimodalMeta: Q = (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      upper(hex(substring(col("text"), 1, 4))).as("header_hex"),
      col("source"))

  /** Partition/batch shape audit for the decode stage: rows per modality
    * "shard" (source), min/max payload sizes — what you check before
    * fanning out an expensive decode. */
  val multimodalBatchShape: Q = (s, dir) =>
    t(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min(octet_length(col("text"))).cast("long").as("min_bytes"),
        max(octet_length(col("text"))).cast("long").as("max_bytes"),
        sum(octet_length(col("text"))).cast("long").as("total_bytes"))

  val queries: Seq[(String, Q)] = Seq(
    "multimodal_meta" -> multimodalMeta,
    "multimodal_batch_shape" -> multimodalBatchShape)

  val oracles: Seq[(String, String)] = Seq(
    "multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         upper(hex(substr(text, 1, 4))) AS header_hex, source
         FROM documents""",
    "multimodal_batch_shape" ->
      """SELECT source, COUNT(*) AS n_docs,
         CAST(MIN(octet_length(CAST(text AS BLOB))) AS BIGINT) AS min_bytes,
         CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes,
         CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
         FROM documents GROUP BY source""")
}
