package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Baseline: brute-force cosine top-k (the correctness reference).
  * Scale path: IVF-style bucketed search — candidates restricted to the
  * query's partition (`label` is the cluster assignment), turning the
  * all-pairs cross join into a co-partitioned equi-join on the bucket
  * key. At 100 TB the bucket key is what you shuffle/bucket the index
  * table by, so each probe touches one partition, not the corpus.
  */
object SimilarityOps {

  /** embeddings with double-precision vectors and precomputed norms;
    * cosine = fold(zip_with) / (norm·norm) — sequential index-order fold
    * for cross-engine determinism. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", expr(s"sqrt(${dotSql(s, "v", "v")})"))

  /** Brute-force cosine top-5 for query vectors vec_id < 10. */
  val annBruteforceTopk: Q = (s, dir) => {
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") < 10)
    val scored = q.as("q").join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        round(expr(dotSql(s, "q.v", "c.v")) / (col("q.norm") * col("c.norm")), 6).as("cos6"))
    val w = Window.partitionBy("qid").orderBy(col("cos6").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
  }

  /** IVF-bucketed top-3: candidates share the query's label bucket. */
  val annIvfLabel: Q = (s, dir) => {
    val e = vecs(s, dir)
    val q = e.filter(col("vec_id") < 50)
    val scored = q.as("q").join(e.as("c"),
        col("q.label") === col("c.label") && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"),
        col("q.label").as("bucket"),
        round(expr(dotSql(s, "q.v", "c.v")) / (col("q.norm") * col("c.norm")), 6).as("cos6"))
    val w = Window.partitionBy("qid").orderBy(col("cos6").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
  }

  /** Per-bucket index statistics (count, mean norm). */
  val embeddingStats: Q = (s, dir) =>
    vecs(s, dir).groupBy("label")
      .agg(count(lit(1)).as("n"), round(avg(col("norm")), 6).as("avg_norm6"))

  val queries: Seq[(String, Q)] = Seq(
    "ann_bruteforce_topk" -> annBruteforceTopk,
    "ann_ivf_label" -> annIvfLabel,
    "embedding_stats" -> embeddingStats,
    "embedding_centroids" -> ((s, dir) => graft.ext.Centroids.centroidsByLabel(s, dir)))

  private val vecsSql =
    """SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       FROM embeddings"""

  val oracles: Seq[(String, String)] = Seq(
    "ann_bruteforce_topk" ->
      s"""WITH e AS ($vecsSql),
          scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid,
              round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos6
            FROM e q JOIN e c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < 10)
          SELECT qid, nid, cos6, rk FROM (
            SELECT qid, nid, cos6,
              row_number() OVER (PARTITION BY qid ORDER BY cos6 DESC, nid) AS rk
            FROM scored) WHERE rk <= 5""",
    "ann_ivf_label" ->
      s"""WITH e AS ($vecsSql),
          scored AS (
            SELECT q.vec_id AS qid, c.vec_id AS nid, q.label AS bucket,
              round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos6
            FROM e q JOIN e c ON q.label = c.label AND q.vec_id <> c.vec_id
            WHERE q.vec_id < 50)
          SELECT qid, nid, bucket, cos6, rk FROM (
            SELECT qid, nid, bucket, cos6,
              row_number() OVER (PARTITION BY qid ORDER BY cos6 DESC, nid) AS rk
            FROM scored) WHERE rk <= 3""",
    "embedding_stats" ->
      s"""WITH e AS ($vecsSql)
          SELECT label, COUNT(*) AS n, round(AVG(nrm), 6) AS avg_norm6
          FROM e GROUP BY label""",
    "embedding_centroids" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS dim,
         round(AVG(v[i]), 6) AS centroid6
         FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              unnest(generate_series(1, 64)) u(i)
         GROUP BY label, i""")
}
