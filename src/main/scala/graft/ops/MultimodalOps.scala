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

  /** The decoded-feature ANN flow as a first-class catalog entry: the
    * REAL pipeline (attachPayload → source-sharded mapPartitions decode
    * via [[graft.ext.Multimodal.extractFeatures]]) feeding the
    * mean-centered sign-bit LSH → bucket equi-join → per-query top-3
    * tail ([[graft.ext.Multimodal.nearestNeighbors]]). The stub decode
    * is deterministic integer byte-sums / 255.0, so the whole flow —
    * decode included — is DuckDB-expressible the same way
    * `dedup_embedding_lsh` is (the oracle re-derives the features from
    * the text bytes via hex()). */
  val multimodalAnn: Q = (s, dir) => {
    val feats = graft.ext.Multimodal.pipeline(s, dir)
    graft.ext.Multimodal.nearestNeighbors(feats, bits = 8, k = 3)
      .select("qid", "nid", "bucket", "cos6", "rk")
  }

  val queries: Seq[(String, Q)] = Seq(
    "multimodal_meta" -> multimodalMeta,
    "multimodal_batch_shape" -> multimodalBatchShape,
    "multimodal_ann" -> multimodalAnn)

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
         FROM documents GROUP BY source""",
    "multimodal_ann" ->
      // mirrors the stub decode byte-for-byte: UTF-8 payload bytes via
      // hex(), per-(pos % 8) integer sums, one /255.0 division, cast to
      // FLOAT (the stub's output type) then back to DOUBLE for the
      // cosine — then the same round-6 centered sign-bit bucketing,
      // bucket self-join, and per-query top-3 as the Spark plan
      """WITH by AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
                            octet_length(CAST(text AS BLOB)) AS n
                     FROM documents),
          pos AS (SELECT doc_id, (i - 1) % 8 AS j,
                         CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS bv
                  FROM by, unnest(generate_series(1, n)) AS u(i)),
          acc AS (SELECT doc_id, j, SUM(bv) AS s FROM pos GROUP BY doc_id, j),
          dims AS (SELECT doc_id, j
                   FROM (SELECT DISTINCT doc_id FROM by), unnest(generate_series(0, 7)) AS d(j)),
          feat AS (SELECT d.doc_id, d.j,
                          CAST(CAST(COALESCE(a.s, 0) / 255.0 AS FLOAT) AS DOUBLE) AS x
                   FROM dims d LEFT JOIN acc a ON d.doc_id = a.doc_id AND d.j = a.j),
          m AS (SELECT j, round(AVG(x), 6) AS m FROM feat GROUP BY j),
          bits AS (SELECT f.doc_id,
                          string_agg(CASE WHEN f.x >= m.m THEN '1' ELSE '0' END, ''
                                     ORDER BY f.j) AS bucket
                   FROM feat f JOIN m ON f.j = m.j GROUP BY f.doc_id),
          vecs AS (SELECT doc_id, list(x ORDER BY j) AS v FROM feat GROUP BY doc_id),
          bk AS (SELECT v.doc_id, v.v, b.bucket,
                        sqrt(list_dot_product(v.v, v.v)) AS nrm
                 FROM vecs v JOIN bits b ON v.doc_id = b.doc_id),
          scored AS (SELECT a.doc_id AS qid, b.doc_id AS nid, a.bucket AS bucket,
                            round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos6
                     FROM bk a JOIN bk b
                       ON a.bucket = b.bucket AND a.doc_id <> b.doc_id)
          SELECT qid, nid, bucket, cos6, rk FROM (
            SELECT qid, nid, bucket, cos6,
                   CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY cos6 DESC, nid) AS BIGINT) AS rk
            FROM scored)
          WHERE rk <= 3""")
}
