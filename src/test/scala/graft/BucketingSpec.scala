package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Scale-posture proof: bucketing both sides of a join on the join key
  * eliminates the shuffle entirely — the plan contains zero
  * ShuffleExchange operators. This is the co-located-join strategy the
  * engine prescribes for repeated large-table joins at 100 TB
  * (SURVEY §7.3: pre-partitioning/bucketing for co-located joins).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join has no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // force the sort-merge path (tiny test tables would broadcast) and a
    // static plan we can inspect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bkt.orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bkt.lineitem_b")

    val joined = spark.table("bkt.lineitem_b")
      .join(spark.table("bkt.orders_b"),
        spark.table("bkt.lineitem_b")("l_orderkey") === spark.table("bkt.orders_b")("o_orderkey"))
      .groupBy("o_orderstatus").count()

    val plan = joined.queryExecution.executedPlan
    val shufflesBeforeAgg = plan.collect { case e: ShuffleExchangeExec => e }
    // the only legal exchange is the final tiny groupBy on orderstatus;
    // the join itself must be shuffle-free
    assert(shufflesBeforeAgg.length <= 1,
      s"expected at most the aggregation exchange, got:\n${plan.treeString}")
    val joinNode = plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNode.isDefined, "expected a sort-merge join over bucketed tables")
    val shufflesUnderJoin = joinNode.get.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle:\n${joinNode.get.treeString}")
    // and the result is correct
    val total = joined.collect().map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$dir/lineitem.parquet").count())
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("persisted vocab index: tfidf probe reads the vocab in place and matches inline") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    graft.ops.TextOps.writeVocabIndex(docs, "bkt.vocab")
    val probed = graft.ops.TextOps.tfidfAgainstVocab(
      spark, docs, "bkt.vocab", docs.count())
    // the vocabulary side of the join must read its buckets in place
    val plan = probed.queryExecution.executedPlan
    val joinNode = plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNode.isDefined, plan.treeString)
    val rightShuffles = joinNode.get.right.collect { case e: ShuffleExchangeExec => e }
    assert(rightShuffles.isEmpty,
      s"vocab side must not shuffle:\n${joinNode.get.right.treeString}")
    // and the scores equal the self-contained catalog query's
    val inline = SparkEntry.queries("text_tfidf_top_terms")(spark, dir)
    assert(probed.exceptAll(inline).isEmpty && inline.exceptAll(probed).isEmpty)

    // BM25 from the same index: df and sum(n_total)=Σdl come straight
    // from the vocab — scores must equal the self-contained query's
    val bm25Probed = graft.ops.TextOps.bm25AgainstVocab(
      spark, docs, "bkt.vocab", docs.count())
    val bm25Inline = SparkEntry.queries("bm25_topk")(spark, dir)
    assert(bm25Probed.exceptAll(bm25Inline).isEmpty &&
      bm25Inline.exceptAll(bm25Probed).isEmpty)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("persisted band index: incremental probe does not shuffle the corpus") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    // existing corpus vs arriving batch: same doc_id % 5 split as
    // dedup_incremental, so the candidate sets are comparable
    val allDocs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    graft.ops.DedupOps.writeBandIndex(
      allDocs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "bkt.band_index")
    val newDocs = allDocs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val hits = graft.ops.DedupOps.incrementalAgainstIndex(spark, newDocs, "bkt.band_index")
    // the INDEX side of the join must read its buckets in place — the
    // only exchanges allowed are on the (small) new-batch side and the
    // final distinct
    val plan = hits.queryExecution.executedPlan
    val joinNode = plan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNode.isDefined, plan.treeString)
    val rightShuffles = joinNode.get.right.collect { case e: ShuffleExchangeExec => e }
    assert(rightShuffles.isEmpty,
      s"index side must not shuffle:\n${joinNode.get.right.treeString}")
    // candidate set equals the catalog query's pre-verification pairs:
    // dedup_incremental = these candidates + signature verification.
    // Compare against its candidates recomputed the self-contained way.
    val expect = graft.ops.DedupOps.dedupIncremental(spark, dir)
      .select("new_id", "existing_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = hits.select("new_id", "existing_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verified pairs are a SUBSET of band-collision candidates
    assert(expect.subsetOf(got), s"missing: ${(expect -- got).take(5)}")
    assert(got.nonEmpty)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("persisted n-gram index: trigram probe reads every model table in place and matches inline") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    graft.ops.TextOps.writeNgramIndex(docs, "bkt.ngram")
    val probed = graft.ops.TextOps.trigramAgainstIndex(spark, docs, "bkt.ngram")
    // every model-side scoring join (tri on (w1,w2,w3), bi on (w1,w2)
    // AND on the renamed (w2,w3) — rename must preserve the bucket
    // lineage — uni twice on one word) must read its buckets in place:
    // the only exchanges allowed sit on the eval-trigram side
    val plan = probed.queryExecution.executedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.length >= 5, s"expected the five scoring joins:\n${plan.treeString}")
    joins.foreach { j =>
      val rightShuffles = j.right.collect { case e: ShuffleExchangeExec => e }
      assert(rightShuffles.isEmpty,
        s"model side must not shuffle:\n${j.right.treeString}")
    }
    // and the scores equal the self-contained catalog query's,
    // row-for-row (shared trigramScore: equivalence reduces to the
    // model tables, which this compares end-to-end)
    val inline = SparkEntry.queries("text_trigram_backoff")(spark, dir)
    assert(probed.exceptAll(inline).isEmpty && inline.exceptAll(probed).isEmpty)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
