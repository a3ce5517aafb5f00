package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** MERGE-ON-READ deletion vectors ([[SnapshotLog.deleteWhereInMOR]] /
  * [[SnapshotLog.compactDeletes]]) — the point-delete cost model where
  * a delete writes O(matching rows) of sidecar instead of rewriting
  * every file stats+bloom cannot exonerate. The contracts pinned here:
  *
  *  - a MOR delete removes exactly the matching rows from every Scala
  *    read path while the DATA FILES stay byte-identical;
  *  - successive deletes UNION; time travel applies each version's own
  *    mask; COW DML and appends on a dv'd table neither resurrect
  *    masked rows nor drop the mask for files they carry;
  *  - the SQL catalog reads a dv-bearing version THROUGH the mask
  *    (round 16; hash-equal to the Scala read, pruning intact,
  *    CAP-FREE — positions materialize on executors from the
  *    partitions' sidecar paths, so no mask is ever driver-sized;
  *    protocol gating remains only for pre-schema manifests);
  *    [[SnapshotLog.compactDeletes]] materializes the
  *    mask (rewriting ONLY dv'd files) and restores the vectorized
  *    scan;
  *  - the streaming source treats new dv entries as a CHANGE version;
  *  - vacuum protects referenced sidecars, and the MOR erasure theorem
  *    holds: only compact + expire + vacuum removes the subject's
  *    bytes from disk. */
class SnapshotMorSpec extends SparkSpec {

  private def freshTable(prefix: String, n: Int = 4000,
      files: Int = 4, at: Option[String] = None): String = {
    val t = at.getOrElse(
      Files.createTempDirectory(s"graft_mor_$prefix").toString + "/t")
    SnapshotLog.commit(spark, t,
      spark.range(n).repartitionByRange(files, col("id")).select(
        col("id").as("k"),
        (col("id") * 7).as("v"),
        md5(col("id").cast("string")).as("pay")))
    t
  }

  private def files(t: String): Seq[String] =
    // an unbounded range ask keeps every file: the public file-list view
    SnapshotLog.pruneFiles(t, "v", None, None)._1

  test("a MOR delete masks exactly the matching rows; data files are untouched") {
    val t = freshTable("basic")
    val before = files(t)
    val keys = Seq(5L, 6L, 1200L, 3999L)
    val v = SnapshotLog.deleteWhereInMOR(spark, t, "k", keys)
    assert(v == 1L)
    assert(files(t) == before, "MOR delete must not touch the data file list")
    val got = SnapshotLog.read(spark, t).select("k").as[Long](
      spark.implicits.newLongEncoder).collect().sorted
    assert(got.length == 4000 - 4)
    assert(keys.forall(k => !got.contains(k)))
    // readWhere and readWhereIn apply the same mask
    assert(SnapshotLog.readWhere(spark, t, "k",
      Some(0L), Some(10L)).count() == 9) // 0..10 minus {5, 6}
    assert(SnapshotLog.readWhereIn(spark, t, "k", Seq(5L, 7L)).count() == 1)
    // time travel: v0 still shows everything
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).count() == 4000)
  }

  test("successive MOR deletes union; each version applies its own mask") {
    val t = freshTable("union")
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(10L, 11L))
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(11L, 12L)) // 11 re-marked
    assert(SnapshotLog.read(spark, t).count() == 3997)
    assert(SnapshotLog.read(spark, t, asOf = Some(1L)).count() == 3998)
    assert(SnapshotLog.read(spark, t, asOf = Some(0L)).count() == 4000)
  }

  test("COW delete on a dv'd table neither resurrects masked rows nor drops carried masks") {
    val t = freshTable("cow")
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(100L, 3500L))
    // range delete rewrites only the low file(s); 3500's mask must carry
    SnapshotLog.deleteWhere(spark, t, "k", Some(0L), Some(50L))
    val got = SnapshotLog.read(spark, t).select("k").as[Long](
      spark.implicits.newLongEncoder).collect().toSet
    assert(!got.contains(100L), "COW rewrite resurrected a masked row")
    assert(!got.contains(3500L), "carried file lost its deletion vector")
    assert(!got.contains(25L) && got.contains(51L))
    assert(got.size == 4000 - 51 - 2)
  }

  test("update and merge on a dv'd table flow through the mask") {
    val t = freshTable("dml")
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(7L))
    SnapshotLog.updateWhereIn(spark, t, "k", Seq(7L, 8L),
      Map("v" -> lit(-1L)))
    val rows = SnapshotLog.read(spark, t)
      .filter(col("v") === -1L).select("k").as[Long](
        spark.implicits.newLongEncoder).collect().toSeq
    assert(rows == Seq(8L), s"masked row 7 must not resurface/update: $rows")
    // merge: delete one key, insert one — over the masked table
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val feed = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(9L, 9000L, "x", "delete"), Row(9000L, 1L, "y", "insert")),
      StructType(Seq(StructField("k", LongType), StructField("v", LongType),
        StructField("pay", StringType), StructField("op", StringType))))
    SnapshotLog.mergeInto(spark, t, feed, "k")
    val ks = SnapshotLog.read(spark, t).select("k").as[Long](
      spark.implicits.newLongEncoder).collect().toSet
    assert(!ks.contains(7L) && !ks.contains(9L) && ks.contains(9000L))
  }

  test("appends carry the mask; compactDeletes materializes and sheds it") {
    val t = freshTable("compact")
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(42L))
    SnapshotLog.commitAppend(spark, t, spark.range(1).select(
      lit(50000L).as("k"), lit(1L).as("v"), lit("zz").as("pay")))
    assert(SnapshotLog.read(spark, t).count() == 4000) // -42 +50000
    val before = files(t)
    val dvd = SnapshotLog.dvAt(t,
      SnapshotLog.latestVersion(t).get).keySet
    assert(dvd.nonEmpty, "append dropped the carried dv entries")
    val v = SnapshotLog.compactDeletes(spark, t)
    assert(SnapshotLog.dvAt(t, v).isEmpty)
    // only the dv'd files were rewritten; every other file carried
    val after = files(t).toSet
    assert(before.filterNot(dvd.contains).forall(after.contains),
      "compactDeletes rewrote an un-dv'd file")
    assert(dvd.forall(f => !after.contains(f)),
      "compactDeletes carried a dv'd file unmaterialized")
    assert(SnapshotLog.read(spark, t).count() == 4000)
    assert(SnapshotLog.readWhereIn(spark, t, "k", Seq(42L)).count() == 0)
    // idempotent: no dvs -> no-op, version unmoved
    assert(SnapshotLog.compactDeletes(spark, t) == v)
  }

  test("the SQL catalog READS a dv-bearing version (masked, hash-equal to the Scala read), cap-free") {
    // committed IN PLACE under the catalog root — manifests record
    // absolute canonical paths, so a post-commit move orphans the data
    val root = Files.createTempDirectory("graft_mor_sqlroot_").toString
    freshTable("sql", at = Some(s"$root/lake/tbl"))
    val lake = Paths.get(root, "lake")
    val cat = s"morcat_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      val td = lake.resolve("tbl").toString
      assert(spark.sql(s"SELECT count(*) c FROM $cat.lake.tbl")
        .head().getLong(0) == 4000)
      SnapshotLog.deleteWhereInMOR(spark, td, "k", Seq(1L, 2500L))
      // the dv-bearing version reads THROUGH SQL: the masked half
      // filters deleted positions per file, the clean half runs the
      // ordinary parquet stack — and the result matches the Scala
      // read row-for-row
      val sqlRows = spark.sql(
        s"SELECT k, v, pay FROM $cat.lake.tbl").collect()
          .map(_.toString).sorted
      val scalaRows = SnapshotLog.read(spark, td)
        .select("k", "v", "pay").collect().map(_.toString).sorted
      assert(sqlRows.length == 3998)
      assert(sqlRows.sameElements(scalaRows),
        "SQL read of the dv-bearing version diverged from the Scala read")
      // a residual predicate composes with the mask (deleted key gone,
      // live keys intact)
      assert(spark.sql(
        s"SELECT count(*) c FROM $cat.lake.tbl WHERE k IN (1, 2, 2500)")
        .head().getLong(0) == 1)
      // VERSION AS OF: the pre-delete version reads unmasked, the
      // dv-bearing version applies its own mask
      assert(spark.sql(
        s"SELECT count(*) c FROM $cat.lake.tbl VERSION AS OF 0")
        .head().getLong(0) == 4000)
      assert(spark.sql(
        s"SELECT count(*) c FROM $cat.lake.tbl VERSION AS OF 1")
        .head().getLong(0) == 3998)
      // the SQL path is CAP-FREE: deleted positions materialize on the
      // EXECUTORS from the partition's sidecar paths, never as a
      // driver map — the inline-mask positions conf (which gates the
      // SCALA read's plan-embedded expression vs its anti-join) must
      // not affect SQL at all
      spark.conf.set("spark.graft.dv.inlineMaskMaxPositions", "0")
      try assert(spark.sql(s"SELECT count(*) c FROM $cat.lake.tbl")
        .head().getLong(0) == 3998,
        "SQL must read the mask regardless of the driver-map conf")
      finally spark.conf.unset("spark.graft.dv.inlineMaskMaxPositions")
      // TIMESTAMP AS OF composes with the mask: resolving onto the
      // dv-bearing version applies its mask like VERSION AS OF does
      val dvTs = SnapshotLog.history(td).find(_.version == 1L).get.tsMillis
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(dvTs))
      assert(spark.sql(s"SELECT count(*) c FROM $cat.lake.tbl " +
        s"TIMESTAMP AS OF '$fmt'").head().getLong(0) == 3998)
      SnapshotLog.compactDeletes(spark, td)
      assert(spark.sql(s"SELECT count(*) c FROM $cat.lake.tbl")
        .head().getLong(0) == 3998)
    } finally {
      spark.conf.unset("spark.graft.dv.inlineMaskMaxPositions")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("pushed predicates ROW-GROUP-SKIP inside a masked file's SQL read") {
    // one 64k-row file with ~16 tight row groups and a dv mask: file
    // pruning cannot explain a low scan-output metric — only the v1
    // filters pushed into the masked per-file reader can
    val root = Files.createTempDirectory("graft_mor_rg_").toString
    val t = s"$root/lake/rg"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try {
      SnapshotLog.commit(spark, t,
        spark.range(64000).repartition(1).sortWithinPartitions("id")
          .select(col("id").as("k"),
            md5(col("id").cast("string")).as("pay"),
            (col("id") * 3).as("v")))
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(1205L))
    val cat = s"morrg_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      val q = spark.sql(
        s"SELECT count(*) c FROM $cat.lake.rg WHERE k BETWEEN 1200 AND 1209")
      // collect(), not head(): head() spawns its own limited execution
      // and the base plan's metrics would stay zero
      assert(q.collect()(0).getLong(0) == 9L,
        "the mask must compose with the pushed range")
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def scansIn(p: SparkPlan): Seq[BatchScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scansIn(a.executedPlan)
        case s: QueryStageExec => scansIn(s.plan)
        case b: BatchScanExec => Seq(b)
        case other => (other.children ++ other.subqueries).flatMap(scansIn)
      }
      // the clean half is EMPTY here (the single file is masked), so
      // the inner scan's description carries no path — this query has
      // exactly one scan, take it
      val scan = scansIn(q.queryExecution.executedPlan) match {
        case Seq(one) => one
        case other => fail(s"expected one scan, got ${other.size}")
      }
      val out = scan.metrics("numOutputRows").value
      assert(out > 0 && out < 32000,
        s"masked read did not row-group-skip: scan emitted $out of 64000")
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("a LARGE masked file SPLITS into byte-range partitions; the mask stays correct across split boundaries") {
    // round-17: a dv'd file used to read as ONE whole-file partition —
    // a hot 1 GB masked file serialized onto one task while its clean
    // siblings split. Now masked files split at maxPartitionBytes like
    // clean ones (row groups assign by byte-midpoint; row indexes stay
    // absolute), so parallelism returns and the mask must hold exactly
    // across split boundaries.
    val root = Files.createTempDirectory("graft_mor_split_").toString
    val t = s"$root/lake/big"
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try {
      SnapshotLog.commit(spark, t,
        spark.range(128000).repartition(1).sortWithinPartitions("id")
          .select(col("id").as("k"),
            md5(col("id").cast("string")).as("pay"),
            (col("id") * 3).as("v")))
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
    // scattered deletes hitting DIFFERENT row groups (first, middle,
    // last), so a split-boundary mistake would surface as a resurrected
    // or doubly-dropped row
    val dead = Seq(5L, 40000L, 79999L, 100000L, 127999L)
    SnapshotLog.deleteWhereInMOR(spark, t, "k", dead)
    val cat = s"morsplit_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // default split size: the file is far under 128 MB — one partition
      val whole = spark.sql(s"SELECT k, v FROM $cat.lake.big")
      assert(whole.rdd.getNumPartitions == 1,
        s"expected one partition under the default split size")
      // shrink the split size: the SAME masked file fans out
      spark.conf.set("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
      val split = spark.sql(s"SELECT k, v FROM $cat.lake.big")
      val parts = split.rdd.getNumPartitions
      assert(parts > 2, s"masked file did not split: $parts partition(s)")
      // correctness across boundaries: exact survivors, no resurrections,
      // no double-drops — and identical to the Scala read
      val got = split.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == 128000 - dead.size, s"${got.length}")
      val gotKeys = got.map(_._1).toSet
      assert(dead.forall(k => !gotKeys.contains(k)), "a deleted row resurrected")
      assert(got.toSet == SnapshotLog.read(spark, t).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      // pushed predicates still row-group-skip inside a SPLIT masked file
      assert(spark.sql(s"SELECT count(*) c FROM $cat.lake.big " +
        "WHERE k BETWEEN 39995 AND 40005").head().getLong(0) == 10L)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("compaction supersedes sidecars: expire + vacuum reclaims their BYTES; a feed crossing expired versions refuses") {
    // the sidecar half of the erasure theorem, pinned at FILE
    // granularity: compactDeletes stops referencing the sidecars in
    // the new manifest, but older manifests still pin them (time
    // travel), so vacuum may only reclaim them once expiry renounces
    // those versions — and a change feed asked to cross the expired
    // range must refuse, not silently skip history
    val t = freshTable("scvac", n = 400, files = 2)
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(11L, 13L)) // v1: sidecars
    def sidecarFiles: Seq[String] = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(Paths.get(t, "data"))) { st =>
        st.iterator().asScala.filter(p =>
          Files.isRegularFile(p) && p.toString.endsWith(".parquet") &&
            p.getParent.getFileName.toString.startsWith("v1-"))
          .map(_.toString).toList
      }
    }
    assert(sidecarFiles.nonEmpty, "fixture: the MOR delete wrote sidecars")
    SnapshotLog.compactDeletes(spark, t)                        // v2
    // superseded but still pinned by v1's manifest: vacuum keeps them
    SnapshotLog.vacuum(t, minAgeMillis = 0L)
    assert(sidecarFiles.nonEmpty,
      "vacuum reclaimed sidecars a surviving manifest still references")
    assert(SnapshotLog.read(spark, t, asOf = Some(1L)).count() == 398)
    // expiry renounces v0/v1 — the age-floor path may now reclaim
    SnapshotLog.expireVersions(t, keepLast = 1)
    SnapshotLog.vacuum(t, minAgeMillis = 0L)
    assert(sidecarFiles.isEmpty,
      "superseded sidecars must be reclaimable after compact + expire")
    assert(SnapshotLog.read(spark, t).count() == 398)
    // a feed range crossing the expired versions refuses loudly
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.readChangeFeed(spark, t, -1, 2).collect()
    }
    assert(e.getMessage.contains("expired"), e.getMessage)
    // the surviving suffix still feeds (v2 is a maintenance rewrite —
    // content-identical, an empty feed with the right shape)
    assert(SnapshotLog.readChangeFeed(spark, t, 2, 2).count() == 0L)
  }

  test("a dv-bearing PRE-SCHEMA manifest refuses SQL loudly (the one remaining protocol gate)") {
    // a manifest that never recorded a schema cannot take the pruning
    // wrapper the masked scan rides — and over-answering (resurrecting
    // deleted rows through the plain scan) is the one unacceptable
    // outcome, so the catalog must refuse, naming the fix
    val root = Files.createTempDirectory("graft_mor_preschema_").toString
    val t = s"$root/lake/legacy"
    spark.range(100).select(col("id").as("k"), (col("id") * 3).as("v"))
      .coalesce(1).write.parquet(s"$t/data")
    import scala.jdk.CollectionConverters._
    val part = java.nio.file.Files.list(Paths.get(s"$t/data")).iterator()
      .asScala.map(_.toString).filter(_.endsWith(".parquet")).toSeq
    SnapshotLog.publish(t, 0L, part) // schema-less, pre-round-10 shape
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(3L))
    // the Scala path reads the mask fine (schema inference)
    assert(SnapshotLog.read(spark, t).count() == 99)
    val cat = s"morps_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      val e = intercept[RuntimeException] {
        spark.sql(s"SELECT count(*) FROM $cat.lake.legacy").collect()
      }
      assert(e.getMessage.contains("pre-schema") &&
        e.getMessage.contains("compactDeletes"), e.getMessage)
      // compaction (which records a schema) restores SQL readability
      SnapshotLog.compactDeletes(spark, t)
      assert(spark.sql(s"SELECT count(*) FROM $cat.lake.legacy")
        .head().getLong(0) == 99)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("a COLUMN-MAPPED dv-bearing version reads through SQL (masked half under physical names)") {
    val root = Files.createTempDirectory("graft_mor_sqlmap_").toString
    freshTable("mapped", at = Some(s"$root/lake/tbl"))
    val td = Paths.get(root, "lake", "tbl").toString
    SnapshotLog.renameColumn(td, "k", "doc_id")
    SnapshotLog.deleteWhereInMOR(spark, td, "doc_id", Seq(3L, 2500L))
    val cat = s"mormap_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try {
      // the masked reader consumes the PHYSICAL read schema positionally;
      // SQL sees logical names — rows must match the Scala read exactly
      val sqlRows = spark.sql(
        s"SELECT doc_id, v FROM $cat.lake.tbl WHERE doc_id < 10")
        .collect().map(_.toString).sorted
      val scalaRows = SnapshotLog.read(spark, td)
        .filter(col("doc_id") < 10).select("doc_id", "v")
        .collect().map(_.toString).sorted
      assert(sqlRows.length == 9 && sqlRows.sameElements(scalaRows))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("a MOR delete under a RENAMED column translates through the map") {
    val t = freshTable("mapped")
    SnapshotLog.renameColumn(t, "k", "doc_id")
    SnapshotLog.deleteWhereInMOR(spark, t, "doc_id", Seq(3L))
    val got = SnapshotLog.read(spark, t)
    assert(got.columns.head == "doc_id")
    assert(got.filter(col("doc_id") === 3L).count() == 0)
    assert(got.count() == 3999)
  }

  test("the streaming source treats new dv entries as a change version") {
    val t = freshTable("stream", n = 100, files = 1)
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(1L))
    def run(ignore: Boolean): Long = {
      val out = Files.createTempDirectory("graft_mor_sink_").toString
      val q = spark.readStream.format("graft-snaplog")
        .option("tableDir", t)
        .option("ignoreChanges", ignore.toString)
        .load()
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      spark.read.schema("k LONG, v LONG, pay STRING")
        .parquet(s"$out/data").count()
    }
    val e = intercept[Exception] { run(ignore = false) }
    def rootMsg(x: Throwable): String =
      if (x == null) "" else x.getMessage + rootMsg(x.getCause)
    assert(rootMsg(e).contains("deletion vectors"), rootMsg(e).take(500))
    // ignoreChanges: the stream continues past the deletion; rows
    // emitted are v0's files (the deletion never reaches the sink)
    assert(run(ignore = true) == 100L)
  }

  test("a MOR update masks the old rows and appends post-images in one commit") {
    val t = freshTable("upd")
    val before = files(t)
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(17L, 2100L),
      Map("v" -> lit(-5L)))
    // count unchanged; exactly the two post-image rows carry the value
    val df = SnapshotLog.read(spark, t)
    assert(df.count() == 4000)
    assert(df.filter(col("v") === -5L).select("k").as[Long](
      spark.implicits.newLongEncoder).collect().toSet == Set(17L, 2100L))
    // affected files carried byte-identical; post-images are NEW files
    val after = files(t)
    assert(before.forall(after.contains), "MOR update rewrote a data file")
    assert(after.size > before.size, "MOR update appended no post-image file")
    // time travel shows the pre-update values
    assert(SnapshotLog.read(spark, t, asOf = Some(0L))
      .filter(col("v") === -5L).count() == 0)
    // a SECOND update of the same key hits the post-image row
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(17L),
      Map("v" -> lit(-6L)))
    val df2 = SnapshotLog.read(spark, t)
    assert(df2.count() == 4000)
    assert(df2.filter(col("k") === 17L).select("v").head().getLong(0) == -6L)
    assert(df2.filter(col("v") === -5L).count() == 1) // 2100 unchanged
    // an update of a MOR-DELETED key must not resurrect it
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(2100L))
    SnapshotLog.updateWhereInMOR(spark, t, "k", Seq(2100L),
      Map("v" -> lit(-7L)))
    val df3 = SnapshotLog.read(spark, t)
    assert(df3.filter(col("k") === 2100L).count() == 0,
      "updating a deleted key resurrected it")
    assert(df3.count() == 3999)
    // compaction materializes the whole history: values persist, dv gone
    val cv = SnapshotLog.compactDeletes(spark, t)
    assert(SnapshotLog.dvAt(t, cv).isEmpty)
    val df4 = SnapshotLog.read(spark, t)
    assert(df4.count() == 3999)
    assert(df4.filter(col("k") === 17L).select("v").head().getLong(0) == -6L)
  }

  test("small masks filter in-plan (DvMaskHit, no join); the conf lever forces the anti-join — same rows") {
    val t = freshTable("planshape")
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(8L, 2500L))
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // materialize so AQE's final shape exists
      df.queryExecution.executedPlan.toString
    }
    // default: sidecars are tiny — the mask rides the plan as the
    // native filter, no anti-join anywhere
    val fast = SnapshotLog.read(spark, t)
    val fastPlan = planOf(fast)
    assert(fastPlan.contains("graft_dv_mask_hit"), fastPlan.take(800))
    assert(!fastPlan.contains("LeftAnti"), fastPlan.take(800))
    // threshold 0: the join path — LeftAnti present, mask filter absent
    spark.conf.set("spark.graft.dv.inlineMaskMaxPositions", "0")
    try {
      val joined = SnapshotLog.read(spark, t)
      val joinedPlan = planOf(joined)
      assert(joinedPlan.contains("LeftAnti"), joinedPlan.take(800))
      assert(!joinedPlan.contains("graft_dv_mask_hit"), joinedPlan.take(800))
      // the two regimes agree row-for-row
      assert(joined.count() == 3998 && fast.count() == 3998)
      assert(joined.select("k").except(fast.select("k")).count() == 0)
    } finally spark.conf.unset("spark.graft.dv.inlineMaskMaxPositions")
  }

  test("structurally equal masks compare equal (plan dedup for self-joined masked reads)") {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import graft.functions.DvMaskHit
    def mk(ps: Array[Long]) = DvMaskHit(
      UnresolvedAttribute(Seq("f")), UnresolvedAttribute(Seq("p")),
      Map("file1" -> ps, "file2" -> Array(9L)))
    val a = mk(Array(1L, 2L, 3L))
    val b = mk(Array(1L, 2L, 3L)) // distinct array instances
    assert(a == b && a.hashCode == b.hashCode,
      "content-equal masks must compare/hash equal")
    assert(a != mk(Array(1L, 2L, 4L)), "different positions must differ")
    assert(a.canonicalized == b.canonicalized,
      "canonicalization (exchange/subquery reuse) must see them equal")
  }

  test("vacuum protects referenced sidecars; compact + expire + vacuum erases") {
    val t = freshTable("erase", n = 400, files = 2)
    val subject = 137L
    SnapshotLog.deleteWhereInMOR(spark, t, "k", Seq(subject))
    // vacuum now: sidecar is referenced, mask must survive
    SnapshotLog.vacuum(t, minAgeMillis = 0L)
    assert(SnapshotLog.read(spark, t).count() == 399)
    // does ANY surviving data file still physically hold the subject's
    // row? (read each file raw, mask-free — compression hides the
    // payload from a byte scan, but a raw read cannot hide a row)
    def onDisk: Boolean = {
      import scala.jdk.CollectionConverters._
      val fs = scala.util.Using.resource(Files.walk(Paths.get(t, "data"))) {
        st => st.iterator().asScala.filter(p =>
          Files.isRegularFile(p) && p.toString.endsWith(".parquet") &&
            // dv sidecars are (file, pos) — only data files carry `k`
            !p.getParent.getFileName.toString.startsWith("v1-"))
          .map(_.toString).toList
      }
      fs.nonEmpty && spark.read.schema("k LONG, v LONG, pay STRING")
        .parquet(fs: _*).filter(col("k") === subject).count() > 0
    }
    // MOR alone does NOT forget: the row is still in the data files
    assert(onDisk, "fixture: the subject's row should still be on disk")
    SnapshotLog.compactDeletes(spark, t)
    SnapshotLog.expireVersions(t, keepLast = 1)
    SnapshotLog.vacuum(t, minAgeMillis = 0L)
    assert(!onDisk, "erasure chain left the subject's row on disk")
    assert(SnapshotLog.read(spark, t).count() == 399)
  }
}
