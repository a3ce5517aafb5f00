package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Storage-partitioned joins on bucketed snapshot tables
  * ([[SnapshotLog.rebucket]] + [[SnapBucketScan]] +
  * [[graft.sources.GraftBucketFunction]]): under
  * `spark.sql.sources.v2.bucketing.enabled`, a join of two tables
  * bucketed with the same (n, column type) plans with NO shuffle on
  * either side — each scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, resolved through the
  * catalog's own FunctionCatalog. The layout lives as the `:bucket`
  * pseudo-stat on every file, so the contract under test is
  * HONEST-DEGRADE: anything that can't provably keep it (COW
  * rewrites, mask-bearing versions, layout-less appends, mismatched
  * bucket counts, the conf left off) falls back to ordinary scans
  * with identical results — the layout is only ever a cost lever. */
class SnapshotBucketSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_bucket_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    spark.conf.set("spark.sql.catalog.bkt", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.bkt.root", r)
    r
  }

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect(): Unit
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Every node of the FINAL physical plan, descending through AQE's
    * QueryStageExec leaves (stages hide their plan from TreeNode
    * traversal) — what shuffle/scan counting must walk. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case n => Seq(n)
    }

  private def joinSubtreeShuffles(plan: SparkPlan): Option[Int] =
    allNodes(plan).collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        allNodes(j).count(_.isInstanceOf[ShuffleExchangeLike])
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        allNodes(j).count(_.isInstanceOf[ShuffleExchangeLike])
    }

  private def bucketScans(plan: SparkPlan): Int =
    allNodes(plan).count {
      case b: BatchScanExec =>
        b.scan.getClass.getSimpleName.contains("SnapBucketScan")
      case _ => false
    }

  /** SPJ on, broadcast off — a tiny fixture would otherwise broadcast
    * and the shuffle-free claim would test nothing. */
  private def withSpj[T](body: => T): T = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }
  }

  private def seed(dir: String, rows: Long, tag: String): Unit =
    SnapshotLog.commit(spark, dir, spark.range(0, rows).toDF("k")
      .withColumn(tag, col("k") * 2).repartition(4))

  test("same-bucket join plans with zero shuffles on either side") {
    root
    seed(s"$root/lake/a", 10000, "va")
    seed(s"$root/lake/b", 4000, "vb")
    SnapshotLog.rebucket(spark, s"$root/lake/a", "k", 8)
    SnapshotLog.rebucket(spark, s"$root/lake/b", "k", 8)
    val q = "SELECT a.k, a.va, b.vb FROM bkt.lake.a a " +
      "JOIN bkt.lake.b b ON a.k = b.k"
    val (plan, rows) = withSpj {
      val df = spark.sql(q)
      (finalPlan(df), df.collect())
    }
    assert(bucketScans(plan) == 2, s"expected two SnapBucketScans:\n$plan")
    assert(joinSubtreeShuffles(plan).contains(0),
      s"the storage-partitioned join must not shuffle:\n$plan")
    // exact result parity with the ordinary (conf off, shuffled) plan
    val plain = spark.sql(q).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      plain.map(_.toString).sorted.toSeq)
    assert(rows.length == 4000)
  }

  test("conf off: ordinary pruned scans, byte-split parallelism intact") {
    root
    val df = spark.sql("SELECT * FROM bkt.lake.a WHERE k < 100")
    assert(bucketScans(finalPlan(df)) == 0)
    assert(df.count() == 100)
  }

  test("append maintains the layout; the join stays shuffle-free") {
    root
    SnapshotLog.commitAppend(spark, s"$root/lake/b",
      spark.range(4000, 4200).toDF("k").withColumn("vb", col("k") * 2))
    val (plan, n) = withSpj {
      val df = spark.sql("SELECT a.k FROM bkt.lake.a a " +
        "JOIN bkt.lake.b b ON a.k = b.k")
      (finalPlan(df), df.count())
    }
    assert(joinSubtreeShuffles(plan).contains(0),
      s"a bucketed append must keep the layout:\n$plan")
    assert(n == 4200)
  }

  test("mismatched bucket counts degrade to a shuffled join, same rows") {
    root
    seed(s"$root/lake/c", 4000, "vc")
    SnapshotLog.rebucket(spark, s"$root/lake/c", "k", 4)
    val (plan, n) = withSpj {
      val df = spark.sql("SELECT a.k FROM bkt.lake.a a " +
        "JOIN bkt.lake.c c ON a.k = c.k")
      (finalPlan(df), df.count())
    }
    assert(joinSubtreeShuffles(plan).exists(_ > 0),
      s"bucket(8) vs bucket(4) must not claim co-partitioning:\n$plan")
    assert(n == 4000)
  }

  test("COW rewrite degrades the layout honestly; results exact") {
    root
    seed(s"$root/lake/d", 1000, "vd")
    SnapshotLog.rebucket(spark, s"$root/lake/d", "k", 8)
    // a COW update harvests fresh stats without :bucket for the
    // rewritten file — the whole-table consistency lapses
    SnapshotLog.updateWhere(spark, s"$root/lake/d", "k", Some(0L), Some(10L),
      Map("vd" -> lit(-1L)))
    val (plan, rows) = withSpj {
      val df = spark.sql("SELECT k, vd FROM bkt.lake.d WHERE vd = -1")
      (finalPlan(df), df.count())
    }
    assert(bucketScans(plan) == 0,
      s"a partially-rewritten table must not report the layout:\n$plan")
    assert(rows == 11)
  }

  test("deletion masks RIDE the bucket scan (SPJ between compactions); " +
      "compactDeletes preserves the layout") {
    root
    seed(s"$root/lake/e", 1000, "ve")
    SnapshotLog.rebucket(spark, s"$root/lake/e", "k", 8)
    SnapshotLog.deleteWhereInMOR(spark, s"$root/lake/e", "k", Seq(1L, 2L))
    // round 18: a mask only DROPS rows — bucket ids are a function of
    // the key — so the dv-bearing version still reports the layout and
    // the bucket scan masks its dv'd files executor-side
    val (p1, n1) = withSpj {
      val df = spark.sql("SELECT k FROM bkt.lake.e")
      (finalPlan(df), df.count())
    }
    assert(bucketScans(p1) == 1,
      s"the masked version must keep the bucket scan:\n$p1")
    assert(n1 == 998, "masked rows leaked through the bucket scan")
    // a JOIN through the mask stays shuffle-free and exact
    val (pj, nj) = withSpj {
      val df = spark.sql("SELECT e.k FROM bkt.lake.e e " +
        "JOIN bkt.lake.a a ON e.k = a.k")
      (finalPlan(df), df.count())
    }
    assert(bucketScans(pj) == 2 && joinSubtreeShuffles(pj).contains(0),
      s"SPJ through a deletion mask must not shuffle:\n$pj")
    assert(nj == 998)
    // the masked rewrite re-partitions by the layout's own hash
    // arithmetic, so compaction keeps the layout (and restores the
    // vectorized scan)
    SnapshotLog.compactDeletes(spark, s"$root/lake/e")
    val (p2, n2) = withSpj {
      val df = spark.sql("SELECT k FROM bkt.lake.e")
      (finalPlan(df), df.count())
    }
    assert(bucketScans(p2) == 1,
      s"compaction must keep the bucket layout:\n$p2")
    assert(n2 == 998)
  }

  test("the full maintenance cycle keeps the SPJ join shuffle-free") {
    root
    // the r17 ceiling, closed: bucketed tables survive MOR delete →
    // compact_deletes → small-file optimize (bucket-keyed cluster)
    // with the zero-exchange join intact — routine maintenance and
    // SPJ are no longer mutually exclusive
    seed(s"$root/lake/m1", 8000, "vm")
    seed(s"$root/lake/m2", 3000, "vn")
    SnapshotLog.rebucket(spark, s"$root/lake/m1", "k", 8)
    SnapshotLog.rebucket(spark, s"$root/lake/m2", "k", 8)
    SnapshotLog.deleteWhereInMOR(spark, s"$root/lake/m1", "k",
      (0L until 100L).toSeq)
    spark.sql("CALL bkt.system.compact_deletes(table => 'lake.m1')")
      .collect(): Unit
    // small-file compaction through the CALL surface, cluster key ==
    // bucket key → merged within buckets, layout re-minted
    spark.sql("CALL bkt.system.optimize(table => 'lake.m1', " +
      "target_records_per_file => 4000, cluster_by => 'k')")
      .collect(): Unit
    val files = SnapshotLog.pruneFiles(s"$root/lake/m1", "k", None, None)._1
    assert(files.size <= 8, s"optimize must merge within buckets: $files")
    val q = "SELECT a.k, a.vm, b.vn FROM bkt.lake.m1 a " +
      "JOIN bkt.lake.m2 b ON a.k = b.k"
    val (plan, rows) = withSpj {
      val df = spark.sql(q)
      (finalPlan(df), df.collect())
    }
    assert(bucketScans(plan) == 2,
      s"both sides must still report the layout:\n$plan")
    assert(joinSubtreeShuffles(plan).contains(0),
      s"the join must stay shuffle-free through maintenance:\n$plan")
    // result parity with the ordinary shuffled plan
    val plain = spark.sql(q).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      plain.map(_.toString).sorted.toSeq)
    assert(rows.length == 2900)
  }

  test("MOR update and keyed merge re-bucket their post-images; the " +
      "layout survives churn -> compaction") {
    root
    seed(s"$root/lake/mu", 4000, "vg")
    SnapshotLog.rebucket(spark, s"$root/lake/mu", "k", 8)
    // a MOR point update masks old rows and appends post-images — the
    // post-images now re-partition by the layout's hash, so after the
    // masks compact away the whole file set still agrees on :bucket
    SnapshotLog.updateWhereInMOR(spark, s"$root/lake/mu", "k",
      (0L until 50L).toSeq, Map("vg" -> lit(-7L)))
    // a keyed merge feed (insert new + update existing + delete)
    import spark.implicits._
    val feed = Seq(
      (9000L, -1L, "insert"), (100L, -2L, "update"), (200L, 0L, "delete"))
      .toDF("k", "vg", "op")
    SnapshotLog.mergeIntoMOR(spark, s"$root/lake/mu", feed, "k")
    SnapshotLog.compactDeletes(spark, s"$root/lake/mu")
    val (plan, rows) = withSpj {
      val df = spark.sql("SELECT k, vg FROM bkt.lake.mu WHERE vg = -7")
      (finalPlan(df), df.count())
    }
    assert(bucketScans(plan) == 1,
      s"the layout must survive MOR churn + compaction:\n$plan")
    assert(rows == 50)
    assert(spark.sql("SELECT vg FROM bkt.lake.mu WHERE k = 9000")
      .collect().map(_.getLong(0)).toSeq == Seq(-1L))
    assert(spark.sql("SELECT count(*) FROM bkt.lake.mu WHERE k = 200")
      .collect()(0).getLong(0) == 0L)
  }

  test("partially-clustered SPJ: one hot bucket splits against a " +
      "replayed other side (skew relief, still zero exchanges)") {
    root
    // LEFT is heavily skewed: 18k of 20k rows share key 7 — one hot
    // bucket — and maxRecordsPerFile splits it into ~5 files at
    // rebucket time (same task index, same :bucket id). RIGHT is tiny
    // and even.
    val ldir = s"$root/lake/sk1"
    val rdir = s"$root/lake/sk2"
    SnapshotLog.commit(spark, ldir,
      spark.range(0, 20000).toDF("i")
        .select(when(col("i") < 18000, lit(7L)).otherwise(col("i")).as("k"),
          col("i").as("lv")).repartition(4))
    SnapshotLog.commit(spark, rdir,
      spark.range(0, 50).toDF("k").withColumn("rv", col("k") * 3))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4000")
    try {
      SnapshotLog.rebucket(spark, ldir, "k", 4)
      SnapshotLog.rebucket(spark, rdir, "k", 4)
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val q = "SELECT l.k, l.lv, r.rv FROM bkt.lake.sk1 l " +
      "JOIN bkt.lake.sk2 r ON l.k = r.k"
    val plain = spark.sql(q).collect().map(_.toString).sorted.toSeq
    def joinParts(p: SparkPlan): Int = allNodes(p).collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.outputPartitioning.numPartitions
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.outputPartitioning.numPartitions
    }.getOrElse(-1)
    // grouped SPJ: zero exchanges, exactly n join partitions — the hot
    // bucket serializes onto one task
    val (pG, rG) = withSpj {
      val df = spark.sql(q); (finalPlan(df), df.collect())
    }
    assert(joinSubtreeShuffles(pG).contains(0))
    assert(joinParts(pG) == 4, s"grouped SPJ expected 4 partitions:\n$pG")
    assert(rG.map(_.toString).sorted.toSeq == plain)
    // partially-clustered: the skewed side's per-file partitions stay
    // ungrouped and the tiny side's groups replay against each piece —
    // more join tasks than buckets, still not one exchange
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution" +
        ".enabled", "true")
    val (pP, rP) = try withSpj {
      val df = spark.sql(q); (finalPlan(df), df.collect())
    } finally {
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution" +
          ".enabled")
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    }
    assert(joinSubtreeShuffles(pP).contains(0),
      s"partially-clustered SPJ must still not shuffle:\n$pP")
    assert(joinParts(pP) > 4,
      s"the hot bucket must split past the bucket count:\n$pP")
    assert(rP.map(_.toString).sorted.toSeq == plain,
      "partially-clustered SPJ changed the result")
  }

  test("z-order WITHIN buckets (opt-in): SPJ layout + 2-D pruning " +
      "compose; the plain z-order still sheds") {
    root
    val dir = s"$root/lake/zb"
    SnapshotLog.commit(spark, dir, spark.range(0, 40000).toDF("k")
      .withColumn("x", col("k") % 200)
      .withColumn("y", (col("k") * 31) % 200).repartition(4))
    SnapshotLog.rebucket(spark, dir, "k", 4)
    // opt-in composition through the CALL surface: buckets kept, the
    // z-curve arranged INSIDE each (multiple files per bucket via the
    // per-file target)
    spark.sql("CALL bkt.system.optimize(table => 'lake.zb', " +
      "target_records_per_file => 2500, zorder_by => 'x,y', " +
      "zorder_within_buckets => true)").collect(): Unit
    val p = withSpj(finalPlan(spark.sql("SELECT k FROM bkt.lake.zb")))
    assert(bucketScans(p) == 1,
      s"zOrderWithinBuckets must keep the layout:\n$p")
    // both z dimensions prune at FILE level inside the kept layout
    val (keptX, totalX) = SnapshotLog.pruneFiles(dir, "x", Some(0L), Some(10L))
    val (keptY, totalY) = SnapshotLog.pruneFiles(dir, "y", Some(0L), Some(10L))
    assert(totalX > 4 && keptX.size < totalX,
      s"x-dim pruning dead: ${keptX.size}/$totalX")
    assert(keptY.size < totalY, s"y-dim pruning dead: ${keptY.size}/$totalY")
    // results exact through the composed layout
    assert(spark.sql("SELECT count(*) FROM bkt.lake.zb WHERE x < 10")
      .head.getLong(0) == 2000L)
    // the DEFAULT z-order is a deliberate global re-layout — sheds
    SnapshotLog.optimize(spark, dir, 2500, zOrderBy = Seq("x", "y"))
    val p2 = withSpj(finalPlan(spark.sql("SELECT k FROM bkt.lake.zb")))
    assert(bucketScans(p2) == 0,
      s"a global z-order must shed the layout:\n$p2")
  }

  test("optimize with a FOREIGN cluster key still sheds the layout") {
    root
    seed(s"$root/lake/n1", 2000, "vx")
    SnapshotLog.rebucket(spark, s"$root/lake/n1", "k", 8)
    // clustering on vx asks for a different physical order — the
    // honest-degrade contract stands for deliberate re-layouts
    SnapshotLog.optimize(spark, s"$root/lake/n1", 1000,
      clusterBy = Seq("vx"))
    val p = withSpj(finalPlan(spark.sql("SELECT k FROM bkt.lake.n1")))
    assert(bucketScans(p) == 0,
      s"a foreign-keyed optimize must shed the layout:\n$p")
  }

  test("column rename keeps the layout (the pseudo-stat is physical)") {
    root
    seed(s"$root/lake/f", 2000, "vf")
    SnapshotLog.rebucket(spark, s"$root/lake/f", "k", 8)
    SnapshotLog.renameColumn(s"$root/lake/f", "k", "key")
    val (plan, n) = withSpj {
      val df = spark.sql("SELECT a.k FROM bkt.lake.a a " +
        "JOIN bkt.lake.f f ON a.k = f.key")
      (finalPlan(df), df.count())
    }
    assert(bucketScans(plan) == 2 && joinSubtreeShuffles(plan).contains(0),
      s"the renamed bucket column must keep co-partitioning:\n$plan")
    assert(n == 2000)
  }

  test("predicates compose: file pruning + row-group pushdown, exact rows") {
    root
    val (plan, rows) = withSpj {
      val df = spark.sql("SELECT k, va FROM bkt.lake.a WHERE k >= 9990")
      (finalPlan(df), df.collect())
    }
    assert(bucketScans(plan) == 1)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (9990L until 10000L).toSeq)
  }

  test("CALL system.rebucket establishes the layout through SQL") {
    root
    seed(s"$root/lake/g", 1000, "vg")
    val out = spark.sql(
      "CALL bkt.system.rebucket(table => 'lake.g', col => 'k', " +
        "num_buckets => 8)").collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L, out.mkString(", "))
    assert(SnapshotLog.history(s"$root/lake/g")
      .maxBy(_.version).op == "rebucket")
    val plan = withSpj(finalPlan(spark.sql("SELECT k FROM bkt.lake.g")))
    assert(bucketScans(plan) == 1, s"CALL rebucket must enable SPJ:\n$plan")
    // DESCRIBE surfaces the layout (the properties() face)
    val desc = spark.sql("DESCRIBE TABLE EXTENDED bkt.lake.g").collect()
      .map(_.toString).mkString("\n")
    assert(desc.contains("bucket(8, k)"), desc.takeRight(400))
  }

  test("grouped aggregation on the bucket key is exchange-free too") {
    root
    // KeyGroupedPartitioning(bucket(n, k)) satisfies
    // ClusteredDistribution(k): rows sharing k provably share a
    // partition (the id is a function of k), so a lone GROUP BY k over
    // a bucketed table aggregates in place — no exchange at all, the
    // second shuffle the layout deletes beyond the join
    if (!Files.exists(Paths.get(s"$root/lake/h"))) {
      seed(s"$root/lake/h", 3000, "vh")
      SnapshotLog.rebucket(spark, s"$root/lake/h", "k", 8)
    }
    val (plan, n) = withSpj {
      val df = spark.sql(
        "SELECT k, count(*) AS c FROM bkt.lake.h GROUP BY k")
      (finalPlan(df), df.count())
    }
    val shuffles = allNodes(plan).count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 0,
      s"GROUP BY the bucket key must aggregate in place:\n$plan")
    assert(n == 3000)
  }

  test("rebucket(sortWithin): intra-bucket clustering keeps range pruning alive") {
    root
    val dir = s"$root/lake/srt"
    SnapshotLog.commit(spark, dir, spark.range(0, 20000).toDF("k")
      .withColumn("v", col("k")).repartition(4))
    // multiple files per bucket (sorted, so each file holds a tight
    // v-slice of its bucket) — the shape sortWithin exists for
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1000")
    try SnapshotLog.rebucket(spark, dir, "k", 4, sortWithin = Seq("v"))
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val (plan, rows) = withSpj {
      val df = spark.sql(
        "SELECT k, v FROM bkt.lake.srt WHERE v >= 100 AND v < 200")
      (finalPlan(df), df.collect())
    }
    assert(bucketScans(plan) == 1)
    assert(rows.map(_.getLong(1)).sorted.toSeq == (100L until 200L).toSeq)
    // the range ask pruned files BEFORE bucket grouping: each bucket's
    // sorted splits carry disjoint v ranges, so most are provably dead
    val dec = graft.sources.ScanPrune.decisions.collectFirst {
      case (key, v) if key.contains("lake.srt@") && !key.endsWith("#limit") => v
    }
    assert(dec.exists { case (kept, total) => total >= 8 && kept < total / 2 },
      s"sorted buckets must prune on the sort key: $dec")
  }

  test("runtime (DPP) filtering reaches the bucket scan: an empty dim prunes to zero files") {
    root
    val dir = s"$root/lake/rt"
    SnapshotLog.commit(spark, dir, spark.range(0, 5000).toDF("k")
      .withColumn("v", col("k") * 2).repartition(4))
    SnapshotLog.rebucket(spark, dir, "k", 8)
    spark.range(20).select(col("id").as("d_key"),
      when(col("id") < 10, lit("pick")).otherwise(lit("other")).as("tag"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/dim_rt")
    // AQE's empty-relation propagation would collapse the join before
    // the runtime filter fires — exclude it, as the ordinary scan's
    // runtime-prune spec does
    val exclKey = "spark.sql.adaptive.optimizer.excludedRules"
    spark.conf.set(exclKey, "org.apache.spark.sql.execution.adaptive" +
      ".AQEPropagateEmptyRelation")
    // broadcast stays ON here (unlike withSpj): DPP is
    // reuse-broadcast-only by default, so disabling broadcast rewrites
    // the pruning expression to literal true and nothing fires
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      graft.sources.ScanPrune.decisions.clear()
      val fact = spark.table("bkt.lake.rt")
      val dimEmpty = spark.read.parquet(s"$root/dim_rt")
        .filter(col("tag") === "nosuch")
      val j = fact.join(dimEmpty, fact("k") === dimEmpty("d_key"))
        .agg(count(lit(1)).as("n"))
      assert(j.collect()(0).getLong(0) == 0L)
      val d = graft.sources.ScanPrune.decisions.collectFirst {
        case (tn, dd) if tn.contains("lake.rt@") && !tn.endsWith("#limit") =>
          dd
      }
      assert(d.contains((0, 8)),
        s"values-less runtime IN must prune every bucket file: $d")
      // and a selective dim stays exact through the bucket partitions
      val dimPick = spark.read.parquet(s"$root/dim_rt")
        .filter(col("tag") === "pick")
      val n = fact.join(dimPick, fact("k") === dimPick("d_key")).count()
      assert(n == 10L)
    } finally {
      spark.conf.unset(exclKey)
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("the change feed refuses a range crossing a rebucket (a rewrite)") {
    root
    val dir = s"$root/lake/cf"
    SnapshotLog.commit(spark, dir, spark.range(0, 100).toDF("k")
      .withColumn("v", col("k")).repartition(2))
    SnapshotLog.rebucket(spark, dir, "k", 4)
    val e = intercept[Exception] {
      SnapshotLog.readChangeFeed(spark, dir, 0, 1).collect()
    }
    assert(e.getMessage.contains("diff"),
      s"a rebucket is a rewrite — the feed must refuse naming diff(): " +
        s"${e.getMessage.take(300)}")
  }

  test("composite keys refuse loudly; the DERIVED-key spelling joins shuffle-free") {
    root
    def seed2(dir: String, rows: Long, tag: String): Unit =
      SnapshotLog.commit(spark, dir, spark.range(0, rows).toDF("id")
        .select((col("id") % 50).as("tenant"), col("id").as("entity"),
          (col("id") * 3).as(tag))
        .withColumn("tk", concat_ws(" ", col("tenant"), col("entity")))
        .repartition(4))
    seed2(s"$root/lake/m1", 6000, "x")
    seed2(s"$root/lake/m2", 3000, "y")
    // multi-column bucket keys cannot power SPJ (Spark's
    // KeyGroupedShuffleSpec matches one reference per transform —
    // measured, the composite transform kept both exchanges) — the
    // verb refuses naming the derived-key spelling
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.rebucketBy(spark, s"$root/lake/m1",
        Seq("tenant", "entity"), 8)
    }
    assert(e.getMessage.contains("concat_ws"), e.getMessage.take(300))
    // the working spelling: ONE derived key column
    SnapshotLog.rebucket(spark, s"$root/lake/m1", "tk", 8)
    SnapshotLog.rebucket(spark, s"$root/lake/m2", "tk", 8)
    val q = "SELECT a.tenant, a.entity, a.x, b.y FROM bkt.lake.m1 a " +
      "JOIN bkt.lake.m2 b ON a.tk = b.tk"
    val (plan, rows) = withSpj {
      val df = spark.sql(q)
      (finalPlan(df), df.collect())
    }
    assert(bucketScans(plan) == 2 && joinSubtreeShuffles(plan).contains(0),
      s"the derived-key join must not shuffle:\n$plan")
    assert(rows.length == 3000)
  }

  test("the bound bucket function replays the write-side arithmetic") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
      StructType}
    val f = graft.sources.GraftBucketFunction
      .bind(StructType(Seq(StructField("n", IntegerType),
        StructField("c", LongType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
        .ScalarFunction[Integer]]
    // Spark's own hash partitioning id (`pmod(hash(v), n)`, murmur3
    // seed 42) is what repartition(n, col) wrote — produceResult must
    // agree value-for-value, null included
    val vs = Seq(0L, 1L, 7L, 42L, -5L, 9999999L)
    val expected = spark.sql("SELECT " + vs.map(v =>
      s"pmod(hash(CAST($v AS BIGINT)), 8)").mkString(", ")).collect()(0)
    vs.zipWithIndex.foreach { case (v, i) =>
      val got = f.produceResult(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](8, v)))
      assert(got == expected.getInt(i),
        s"bucket($v) = $got vs Spark's ${expected.getInt(i)}")
    }
    val nullGot = f.produceResult(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](8, null)))
    val nullExpected = spark.sql(
      "SELECT pmod(hash(CAST(NULL AS BIGINT)), 8)").collect()(0).getInt(0)
    assert(nullGot == nullExpected, s"bucket(null) = $nullGot vs $nullExpected")
  }
}
