package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Staleness semantics of the persisted trigram LM
  * ([[graft.ops.TextOps.trigramScoreNewBatch]]): a new batch scored
  * against a model trained on OTHER documents must (a) score every
  * batch document (no held-out split — the batch is the eval set),
  * (b) bottom out at the add-1 unigram floor for wholly-unseen
  * vocabulary instead of producing nulls or non-finite scores, and
  * (c) rank in-model text above out-of-vocabulary text (the quality
  * filter's actual decision). BucketingSpec pins the plan shape and
  * inline equality for the eval-split twin; this suite pins what
  * SCORES mean when the model is stale.
  */
class TrigramIndexSpec extends SparkSpec {

  test("a new batch scores in full against a stale model; OOV bottoms out at the unigram floor") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS trix")
    // the model's world: three-word sentences over a tiny vocabulary,
    // repeated so the in-model trigrams are deterministic in train
    val train = (0L until 40L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    TextOps.writeNgramIndex(train, "trix.lm")
    // the new batch: one in-model document, one wholly-OOV document,
    // one mixed (unseen trigram over seen words — the bigram level)
    val batch = Seq(
      (1000L, "the cat sat on the mat"),
      (1001L, "zqx wvu rst zqx wvu rst"),
      (1002L, "mat the cat sat on the")).toDF("doc_id", "text")
    val rows = TextOps.trigramScoreNewBatch(spark, batch, "trix.lm")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // (a) every batch document scored — no split filtered anything
    assert(rows.keySet == Set(1000L, 1001L, 1002L), rows.toString)
    rows.foreach { case (id, (nTri, h3, h2, h1, avg)) =>
      assert(h3 + h2 + h1 == nTri, s"$id: levels must partition the trigrams")
      assert(!avg.isNaN && !avg.isInfinite, s"$id: score must be finite, got $avg")
      assert(avg <= 0.0, s"$id: ln of a probability-like S, got $avg")
    }
    // (b) the OOV document never leaves the unigram floor
    val (nOov, oov3, oov2, _, oovAvg) = rows(1001L)
    assert(oov3 == 0 && oov2 == 0 && nOov > 0, rows(1001L).toString)
    // the floor value is exactly ln(0.16 * 1 / (n + v)) micro-rounded —
    // recompute it from the persisted totals
    val tot = spark.table("trix.lm_tot").head()
    val floor = math.rint(math.log(
      0.16 * 1.0 / (tot.getLong(0) + tot.getLong(1)).toDouble) * 1e6) / 1e6
    assert(math.abs(oovAvg - floor) < 1e-6, s"OOV avg $oovAvg != add-1 floor $floor")
    // (c) in-model text outranks OOV text; the mixed doc sits between
    assert(rows(1000L)._5 > rows(1002L)._5 && rows(1002L)._5 > oovAvg, rows.toString)
    // and the train split of the TRAINING corpus was really disjoint
    // from the batch: training doc_ids scored through the eval-split
    // twin do not appear here
    spark.sql("DROP DATABASE trix CASCADE")
  }
}
