package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

/** The persisted IVF-PQ serving index (`writeAnnIndex` /
  * `annAgainstIndex`) — the train-vs-serve split for the ANN family:
  *
  *  - probe == inline capstone row-for-row (both run the SAME
  *    `ivfPqProbe` plan; equivalence reduces to the persisted tables
  *    and the bit-exactness of the reloaded models);
  *  - the reloaded model IS the trained model (parquet doubles
  *    round-trip exactly — the literal folds the probe renders are
  *    character-identical to the inline build's);
  *  - the bucketed codes table PRUNES: a probe that touches a subset
  *    of cells reads only those cells' buckets
  *    (`SelectedBucketsCount` below total in the scan);
  *  - an EXTERNAL query batch (ids the corpus never saw) serves
  *    through the same path — the real usage, where queries are not
  *    corpus rows.
  */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val prefix = "annidx.ann"

  private lazy val index: Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS annidx")
    SimilarityOps.writeAnnIndex(spark, dir, prefix)
  }

  test("probe against the persisted index equals the inline capstone") {
    index
    val inline = SimilarityOps.annIvfPqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    val queries = spark.table(s"${prefix}_vectors")
      .filter(col("vec_id") < SimilarityOps.PqQueryCount)
      .select("vec_id", "v")
    val probed = SimilarityOps.annAgainstIndex(spark, queries, prefix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(probed == inline,
      s"persisted-index probe diverged from the inline build: " +
        s"${(probed -- inline).take(3)} vs ${(inline -- probed).take(3)}")
    assert(probed.nonEmpty)
  }

  test("filtered probe serves only allowed ids, a subset of the unfiltered universe") {
    index
    val queries = spark.table(s"${prefix}_vectors")
      .filter(col("vec_id") < SimilarityOps.PqQueryCount)
      .select("vec_id", "v")
    val allowed = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === SimilarityOps.FilteredLang).select("doc_id")
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val filtered = SimilarityOps.annAgainstIndex(spark, queries, prefix,
      allowedIds = Some(allowed)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(filtered.nonEmpty)
    assert(filtered.forall { case (_, nid, _) => allowedIds.contains(nid) },
      "a served neighbor escaped the predicate")
    // pre-filtering can only SHRINK each query's candidate pool, so a
    // (qid, nid) the filtered probe ranks must appear in the
    // unfiltered probe's ADC universe — spot-check via the unfiltered
    // top-k: every unfiltered hit that IS allowed must also be served
    // at least as high by the filtered probe's ranking
    val unfiltered = SimilarityOps.annAgainstIndex(spark, queries, prefix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val fRank = filtered.map { case (q, n, _) => (q, n) }.toSet
    val missed = unfiltered.filter { case (q, n, rk) =>
      allowedIds.contains(n) && rk <= 1 && !fRank.contains((q, n)) }
    assert(missed.isEmpty,
      s"an allowed unfiltered rank-1 hit vanished under the filter: ${missed.take(3).toSeq}")
  }

  test("the MRL parameterization persists the triple composition through the same tables") {
    spark.sql("CREATE DATABASE IF NOT EXISTS annidx")
    SimilarityOps.writeAnnIndex(spark, dir, "annidx.mrl",
      m = SimilarityOps.MrlPqM, subDim = SimilarityOps.MrlPqSubDim,
      dims = SimilarityOps.MrlDim)
    val inline = SimilarityOps.annMrlIvfPqTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    val queries = spark.table("annidx.mrl_vectors")
      .filter(col("vec_id") < SimilarityOps.PqQueryCount)
      .select("vec_id", "v")
    val probed = SimilarityOps.annAgainstIndex(spark, queries, "annidx.mrl")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(probed == inline)
    assert(probed.nonEmpty)
  }

  test("reloaded model is bit-identical to the trained model") {
    index
    val mu = SimilarityOps.pqMean(spark, dir)
    val cb = SimilarityOps.pqTrain(spark, dir, mu)
    val cents = SimilarityOps.kmeansTrain(spark, dir)
    val (mu2, cb2, cents2) = SimilarityOps.readAnnModel(spark, prefix)
    assert(mu2 == mu)
    assert(cb2 == cb)
    assert(cents2 == cents)
  }

  test("probe reads only the probed cells' buckets") {
    index
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a 2-query batch touches at most 2 of the 8 cells — the codes
      // scan must select strictly fewer buckets than the table has
      val queries = spark.table(s"${prefix}_vectors")
        .filter(col("vec_id") < 2).select("vec_id", "v")
      val probe = SimilarityOps.annAgainstIndex(spark, queries, prefix)
      val plan = probe.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val codesLine = plan.linesIterator
        .filter(_.contains("ann_codes")).mkString("\n")
      val hits = sel.findAllMatchIn(codesLine)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
      assert(hits.nonEmpty, s"no bucket pruning in the codes scan:\n$plan")
      val (selected, total) = hits.head
      assert(selected < total && selected <= 2,
        s"expected <=2 of $total buckets selected, got $selected")
      // and no BroadcastNestedLoopJoin anywhere — the cell equi-join is
      // the whole point of the IVF half
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("large-batch serving shape: identical results, zero index-side exchange") {
    index
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the query batch as a LOCAL frame (new arrivals, not an index
      // scan) — also keeps the index-scan plan assertions unambiguous
      val qRows = spark.table(s"${prefix}_vectors")
        .filter(col("vec_id") < SimilarityOps.PqQueryCount)
        .select("vec_id", "v").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
      import spark.implicits._
      val queries = qRows.toSeq.toDF("vec_id", "v")
      val shuffled = SimilarityOps.annAgainstIndex(spark, queries, prefix,
        broadcastQueries = false)
      val viaShuffle = shuffled.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet
      val viaBroadcast = SimilarityOps.annAgainstIndex(spark, queries, prefix)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .toSet
      assert(viaShuffle == viaBroadcast)
      // every Exchange in the plan moves QUERY-derived or output-sized
      // data; the bucketed codes table and vector store are read IN
      // PLACE — no Exchange sits between an index scan and the join
      // that consumes it (an exchange above a join moves the join's
      // shortlist-sized output, which is fine)
      val plan = shuffled.queryExecution.executedPlan
      val offending = plan.collect { case e: ShuffleExchangeExec => e }
        .filter { e =>
          val hasJoinBelow = e.child.collectFirst {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
          }.isDefined
          val sub = e.child.toString
          !hasJoinBelow && (sub.contains("ann_codes") || sub.contains("ann_vectors"))
        }
      assert(offending.isEmpty,
        s"index-side exchange found:\n${offending.map(_.treeString).mkString}")
      // and both index scans DO appear below some join with no
      // exchange in between (the claim is exchange-free scans, not
      // absent scans)
      val scans = plan.toString
      assert(scans.contains("ann_codes") && scans.contains("ann_vectors"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("day-2 append: new vectors join the index without retraining and are retrievable") {
    spark.sql("CREATE DATABASE IF NOT EXISTS annidx")
    SimilarityOps.writeAnnIndex(spark, dir, "annidx.grow")
    val before = spark.table("annidx.grow_codes").count()
    // the frozen models BEFORE the append — the append must not touch them
    val modelBefore = SimilarityOps.readAnnModel(spark, "annidx.grow")
    // new arrivals: near-twins of two corpus vectors, ids the corpus
    // never saw — their model-assigned cell equals their source's
    val newV = spark.table("annidx.grow_vectors")
      .filter(col("vec_id").isin(3L, 5L))
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(v, x -> x)").as("v"))
    SimilarityOps.appendToAnnIndex(spark, newV, "annidx.grow")
    assert(spark.table("annidx.grow_codes").count() == before + 2)
    assert(SimilarityOps.readAnnModel(spark, "annidx.grow") == modelBefore)
    // the appended codes equal what the frozen model assigns: an exact
    // duplicate must carry its source's (cell, codes) row verbatim
    val codes = spark.table("annidx.grow_codes")
      .filter(col("vec_id").isin(3L, 5L, 100003L, 100005L))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(codes(100003L) == codes(3L) && codes(100005L) == codes(5L))
    // and a probe SERVES the grown index through the same plan: the
    // query batch is the two appended ids themselves — each must come
    // back with a full dense top-k drawn from its model-assigned cell
    // (rows that could only be reached if the appended codes landed in
    // the right bucket)
    val res = SimilarityOps.annAgainstIndex(spark,
      spark.table("annidx.grow_vectors")
        .filter(col("vec_id").isin(100003L, 100005L)).select("vec_id", "v"),
      "annidx.grow").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val byQ = res.groupBy(_._1)
    assert(byQ.keySet == Set(100003L, 100005L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to SimilarityOps.PqTopK))
      // the duplicate's nearest neighbor IS its source vector's cell:
      // every returned bucket equals the source's recorded cell
      val srcCell = codes(qid - 100000L)._1
      assert(rows.forall(_._3 == srcCell), s"$qid served outside $srcCell: ${rows.toSeq}")
    }
  }

  test("screened ingest: a replayed micro-batch re-appends nothing") {
    spark.sql("CREATE DATABASE IF NOT EXISTS annidx")
    SimilarityOps.writeAnnIndex(spark, dir, "annidx.ingest")
    val batch = spark.table("annidx.ingest_vectors")
      .filter(col("vec_id") < 4L)
      .select((col("vec_id") + 70000L).as("vec_id"), col("v"))
    // first delivery appends all 4; the at-least-once replay (same
    // batch again — the foreachBatch contract) appends ZERO
    assert(SimilarityOps.appendToAnnIndexScreened(spark, batch, "annidx.ingest") == 4L)
    val afterFirst = spark.table("annidx.ingest_codes").count()
    assert(SimilarityOps.appendToAnnIndexScreened(spark, batch, "annidx.ingest") == 0L)
    assert(spark.table("annidx.ingest_codes").count() == afterFirst)
    // a mixed batch (2 replayed + 2 new) appends exactly the new ids
    val mixed = spark.table("annidx.ingest_vectors")
      .filter(col("vec_id").isin(0L, 1L, 10L, 11L))
      .select((col("vec_id") + 70000L).as("vec_id"), col("v"))
    assert(SimilarityOps.appendToAnnIndexScreened(spark, mixed, "annidx.ingest") == 2L)
    val ids = spark.table("annidx.ingest_vectors")
      .filter(col("vec_id") >= 70000L).collect().map(_.getLong(0)).toSet
    assert(ids == Set(70000L, 70001L, 70002L, 70003L, 70010L, 70011L))
  }

  test("streaming ingest end-to-end: file-source stream -> screened sink -> grown index") {
    spark.sql("CREATE DATABASE IF NOT EXISTS annidx")
    SimilarityOps.writeAnnIndex(spark, dir, "annidx.stream")
    val before = spark.table("annidx.stream_codes").count()
    val sch = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val stream = spark.readStream.schema(sch)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
      .select((col("vec_id") + 80000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val q = stream.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        SimilarityOps.appendToAnnIndexScreened(spark, b, "annidx.stream"): Unit
    }.option("checkpointLocation", s"$scratch/annidx_stream_ckpt").start()
    try q.processAllAvailable() finally q.stop()
    // the append ran under the micro-batch's session clone; this
    // session's cached relation must be refreshed to see the new
    // files (per-session file-index cache — standard catalog-table
    // behavior, same as any cross-session append)
    spark.catalog.refreshTable("annidx.stream_codes")
    spark.catalog.refreshTable("annidx.stream_vectors")
    // every arriving vector appended exactly once; the grown index
    // serves a streamed id through the unchanged probe plan
    assert(spark.table("annidx.stream_codes").count() == before * 2)
    val res = SimilarityOps.annAgainstIndex(spark,
      spark.table("annidx.stream_vectors").filter(col("vec_id") === 80007L)
        .select("vec_id", "v"),
      "annidx.stream").collect()
    assert(res.length == SimilarityOps.PqTopK)
  }

  test("an external query batch (non-corpus ids) serves end-to-end") {
    index
    // perturb two corpus vectors, give them ids the corpus never saw:
    // the probe must serve them through the same path — top-k per
    // query, ranks dense, scores non-increasing, neighbors from the
    // query's own cell (dot-product ORDER among candidates is the
    // ranking contract; which candidate wins is corpus geometry, not
    // plumbing, so it is not asserted)
    val ext = spark.table(s"${prefix}_vectors")
      .filter(col("vec_id").isin(7L, 11L))
      .select((col("vec_id") + 1000L).as("vec_id"),
        expr("transform(v, x -> x + 0.001D)").as("v"))
    val out = SimilarityOps.annAgainstIndex(spark, ext, prefix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(1007L, 1011L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_._5).sorted.toSeq == (1L to SimilarityOps.PqTopK),
        s"ranks not dense for $qid: ${rows.toSeq}")
      val byRk = rows.sortBy(_._5).map(_._4)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b },
        s"dp6 not non-increasing for $qid: ${byRk.toSeq}")
    }
  }
}
