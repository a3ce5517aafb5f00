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

  /** Video-reader fan-out: fixed-size frames, every-2nd sampling, one
    * row per kept frame with an exact byte-sum checksum
    * ([[graft.ext.Multimodal.sampleFrames]] — the 1→N flatMap inside
    * the sharded mapPartitions kernel). The oracle re-derives frame
    * boundaries and per-frame sums from the payload's hex dump, so the
    * slicing arithmetic itself is gate-checked. */
  val multimodalFrameSample: Q = (s, dir) =>
    graft.ext.Multimodal.sampleFrames(
        graft.ext.Multimodal.attachPayload(t(s, dir, "documents")))
      .toDF()

  /** Nearest-neighbor byte-stream resize to 64 samples
    * ([[graft.ext.Multimodal.resizeAll]]); the checksum pins the
    * ⌊k·n/64⌋ index mapping exactly. */
  val multimodalResize: Q = (s, dir) =>
    graft.ext.Multimodal.resizeAll(
        graft.ext.Multimodal.attachPayload(t(s, dir, "documents")))
      .toDF()

  val queries: Seq[(String, Q)] = Seq(
    "multimodal_meta" -> multimodalMeta,
    "multimodal_batch_shape" -> multimodalBatchShape,
    "multimodal_frame_sample" -> multimodalFrameSample,
    "multimodal_resize" -> multimodalResize,
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
    "multimodal_frame_sample" ->
      // frame boundaries and per-frame byte sums re-derived from the
      // hex dump: byte b (0-based) lives at substr(hx, 2b+1, 2);
      // DuckDB's generate_series is inclusive, so the empty cases
      // (payload shorter than one frame) fall out of n//64 - 1 < 0
      """WITH by AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
                            octet_length(CAST(text AS BLOB)) AS n
                     FROM documents),
          frames AS (SELECT doc_id, CAST(f.fi AS INTEGER) AS frame_idx,
                            CAST(n // 64 AS INTEGER) AS n_frames
                     FROM by, unnest(generate_series(0, n // 64 - 1)) f(fi)
                     WHERE n >= 64),
          sampled AS (SELECT * FROM frames WHERE frame_idx % 2 = 0)
          SELECT s.doc_id, s.frame_idx, s.n_frames,
            CAST(64 AS INTEGER) AS frame_n_bytes,
            CAST(SUM(CAST(('0x' || substr(b.hx, 2 * (s.frame_idx * 64 + u.i) + 1, 2))
                     AS BIGINT)) AS BIGINT) AS checksum
          FROM sampled s JOIN by b ON s.doc_id = b.doc_id,
               unnest(generate_series(0, 63)) u(i)
          GROUP BY s.doc_id, s.frame_idx, s.n_frames""",
    "multimodal_resize" ->
      // the ⌊k·n/64⌋ nearest-neighbor index mapping, byte-for-byte
      """WITH by AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
                            octet_length(CAST(text AS BLOB)) AS n
                     FROM documents)
          SELECT doc_id, CAST(n AS INTEGER) AS n_bytes,
            CAST(SUM(CAST(('0x' || substr(hx, 2 * ((u.k * n) // 64) + 1, 2))
                     AS BIGINT)) AS BIGINT) AS resized_checksum
          FROM by, unnest(generate_series(0, 63)) u(k)
          WHERE n > 0
          GROUP BY doc_id, n""",
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
