package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding-pipeline operators — the ingest-time twins of
  * the batch similarity path (graft.ops.SimilarityOps). The defining
  * property of this family is that a trained model (centroids, LSH
  * planes, quantizer scales) is SMALL and STATIC relative to the
  * stream: scoring is pure in-row work, so the streaming plan needs no
  * state store, no stream-static join, and no watermark — model
  * updates are a redeploy, exactly like the decontamination screen's
  * benchmark set.
  */
object EmbeddingStreams {

  /** Assign every arriving embedding to its nearest centroid of a
    * trained k-means model. `assignExpr` is the literal-centroid argmin
    * fold built by [[graft.ops.SimilarityOps.kmeansAssignExpr]] —
    * rendering the model INTO the expression keeps the streaming plan
    * stateless and join-free (each micro-batch is one map-side pass),
    * the same scale posture as the batch assignment. Emits
    * (vec_id, cluster, d6). */
  def modelAssignScreen(embs: DataFrame, assignExpr: String): DataFrame =
    embs
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("best", expr(assignExpr))
      .select(col("vec_id"), col("best.k").as("cluster"), col("best.d").as("d6"))

  /** PQ-encode every arriving embedding against a trained codebook
    * model — the index-ingest topology of the round-8 PQ family: at
    * 100 TB/day of new embeddings, this stream writes (vec_id, codes)
    * rows 32× smaller than the vectors, stateless and join-free like
    * [[modelAssignScreen]] (the mean and all 8 codebooks ride inside
    * the rendered expressions). `centerE` is the v−μ zip, `encodeE`
    * the per-subspace argmin fold, both built batch-side by
    * SimilarityOps. Emits (vec_id, codes_str). */
  def pqEncodeScreen(embs: DataFrame, centerE: String, encodeE: String): DataFrame =
    embs
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(col("vec_id"), expr(centerE).as("v"))
      .withColumn("codes", expr(encodeE))
      .select(col("vec_id"),
        expr("array_join(transform(codes, c -> cast(c AS STRING)), ',')").as("codes_str"))
}
