package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import sources.{ScanPrune, SnapshotLog}

/** Scan-planning file pruning through the SQL catalog
  * ([[graft.sources.SnapshotCatalog]] → the bridge
  * PruningParquetScanBuilder): predicates SQL pushes down prune the
  * manifest's file list against recorded stats (ranges, null counts)
  * and the bloom index (equality / IN) BEFORE Spark lists a path. The
  * load-bearing property is inherited from the read-side suites: a
  * pruned SQL result always equals the unpruned scan + plan-level
  * filter, because every predicate stays residual. [[ScanPrune.last]]
  * is the observability hook — (table@version, kept, total) of the
  * most recent planning decision. */
class SnapshotCatalogPruneSpec extends SparkSpec {

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_snapprune_").toString
    Files.createDirectories(Paths.get(r, "lake"))
    // clustered: key range-partitioned — stats prune ranges
    SnapshotLog.commit(spark, s"$r/lake/clustered",
      spark.range(8000).repartitionByRange(8, col("id")).select(
        col("id").as("key"),
        when(col("id") % 3 =!= 0, col("id") * 2).as("v")))
    // unclustered: key scrambled (stats blind), bloom-indexed
    SnapshotLog.commit(spark, s"$r/lake/needle",
      spark.range(8000).repartitionByRange(8, col("id")).select(
        ((col("id") * 7919) % 8000).as("key"),
        concat(lit("d"), col("id").cast("string")).as("tag")))
    SnapshotLog.writeBloomIndex(spark, s"$r/lake/needle", "key",
      expectedItemsPerFile = 2048, fpp = 0.01)
    r
  }

  private def registered() = {
    root: Unit
    spark.conf.set("spark.sql.catalog.snap", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  private def lastPrune: (Int, Int) = {
    val (_, kept, total) = ScanPrune.last.get
    (kept, total)
  }

  test("a range predicate prunes files at SQL planning; result equals the Scala path") {
    registered()
    val rows = spark.sql(
      "SELECT key, v FROM snap.lake.clustered WHERE key >= 1000 AND key < 2000")
      .collect().map(_.toString).toSet
    val (kept, total) = lastPrune
    assert(total == 8 && kept <= 2, s"kept $kept/$total")
    val expected = SnapshotLog.read(spark, s"$root/lake/clustered")
      .filter(col("key") >= 1000 && col("key") < 2000)
      .collect().map(_.toString).toSet
    assert(rows == expected && rows.size == 1000)
  }

  test("equality and IN on a bloom-indexed column prune to ~the probed keys' files") {
    registered()
    val one = spark.sql("SELECT tag FROM snap.lake.needle WHERE key = 17")
      .collect().map(_.getString(0))
    val (kept1, total1) = lastPrune
    assert(total1 == 8 && kept1 <= 2, s"kept $kept1/$total1")
    assert(one.length == 1)
    val in = spark.sql(
      "SELECT key, tag FROM snap.lake.needle WHERE key IN (17, 4242, 7993)")
      .collect()
    val (kept2, total2) = lastPrune
    assert(total2 == 8 && kept2 <= 4, s"kept $kept2/$total2")
    assert(in.length == 3)
  }

  test("an un-normalized OR of equalities prunes to the union of branch keeps — same kept set as the IN form") {
    registered()
    // Catalyst does NOT normalize `k=a OR k=b` to IN, so this exercises
    // the translator's own OR handling
    val or = spark.sql(
      "SELECT key FROM snap.lake.clustered WHERE key = 17 OR key = 7999")
      .collect().map(_.getLong(0)).sorted
    assert(or.toSeq == Seq(17L, 7999L))
    val (keptOr, totalOr) = lastPrune
    val in = spark.sql(
      "SELECT key FROM snap.lake.clustered WHERE key IN (17, 7999)")
      .collect().map(_.getLong(0)).sorted
    val (keptIn, totalIn) = lastPrune
    assert(in.toSeq == Seq(17L, 7999L))
    assert(totalOr == 8 && keptOr == keptIn && keptOr <= 2,
      s"OR kept $keptOr/$totalOr, IN kept $keptIn/$totalIn")
    // cross-attribute OR: union of each branch's keep, still exact
    val cross = spark.sql(
      "SELECT key, v FROM snap.lake.clustered WHERE key < 500 OR v IS NULL")
      .count()
    assert(cross == 500 + (8000 / 3 + 1) - 167) // overlap: id<500 ∧ id%3==0
    // an OR with an unsupported branch degrades to keep-all, not a wrong prune
    val rows = spark.sql(
      "SELECT key FROM snap.lake.clustered WHERE key = 17 OR key % 2 = 0")
      .count()
    assert(rows == 4001)
    val (kept, total) = lastPrune
    assert(kept == total, s"unsupported branch must keep all, kept $kept/$total")
  }

  test("IS NULL prunes null-free files; IS NOT NULL keeps correctness on mixed files") {
    registered()
    // v is null on id%3==0 — every file mixes; IS NULL prunes nothing,
    // but on the needle table tag is never null: a null ask prunes ALL
    val nulls = spark.sql(
      "SELECT key FROM snap.lake.clustered WHERE v IS NULL").count()
    assert(nulls == 8000 / 3 + 1)
    val none = spark.sql(
      "SELECT key FROM snap.lake.needle WHERE tag IS NULL").count()
    val (kept, total) = lastPrune
    assert(none == 0 && kept == 0 && total == 8,
      s"null ask on a null-free column should prune everything, kept $kept")
    val notNull = spark.sql(
      "SELECT count(*) AS n FROM snap.lake.clustered WHERE v IS NOT NULL")
      .head().getLong(0)
    assert(notNull == 8000 - (8000 / 3 + 1))
  }

  test("a fully-pruned ask returns an empty result through an empty scan") {
    registered()
    val rows = spark.sql(
      "SELECT * FROM snap.lake.clustered WHERE key > 100000").collect()
    val (kept, _) = lastPrune
    assert(rows.isEmpty && kept == 0)
  }

  test("VERSION AS OF prunes against that version's own stats") {
    registered()
    val t = s"$root/lake/traveled"
    SnapshotLog.commit(spark, t,
      spark.range(1000).repartitionByRange(4, col("id"))
        .select(col("id").as("key")))
    SnapshotLog.commitAppend(spark, t,
      spark.range(1000, 2000).repartitionByRange(4, col("id"))
        .select(col("id").as("key")))
    val v0 = spark.sql(
      "SELECT * FROM snap.lake.traveled VERSION AS OF 0 WHERE key >= 900")
      .count()
    val (kept0, total0) = lastPrune
    // sampled range boundaries (see the mapped-table test): 1 file, 2
    // when a boundary lands inside the asked range
    assert(v0 == 100 && total0 == 4 && kept0 <= 2, s"kept $kept0/$total0")
    val v1 = spark.sql(
      "SELECT * FROM snap.lake.traveled WHERE key >= 900").count()
    val (kept1, total1) = lastPrune
    assert(v1 == 1100 && total1 == 8 && kept1 >= 5 && kept1 <= 6,
      s"kept $kept1/$total1")
  }

  test("a renamed (column-mapped) table file-prunes AND regains scan-level pushdown") {
    registered()
    val t = s"$root/lake/mapped"
    SnapshotLog.commit(spark, t,
      spark.range(4000).repartitionByRange(4, col("id")).select(
        col("id").as("k"), (col("id") * 3).as("v")))
    SnapshotLog.renameColumn(t, "k", "doc_key")
    val df = spark.sql(
      "SELECT doc_key, v FROM snap.lake.mapped WHERE doc_key BETWEEN 1000 AND 1999")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.size == 1000 && rows.forall { case (k, v) => v == k * 3 })
    val (kept, total) = lastPrune
    // repartitionByRange boundaries are SAMPLED (seeded by rdd id, so
    // session history moves them): the asked range spans 1 file, or 2
    // when a boundary lands inside it — never more
    assert(total == 4 && kept <= 2, s"kept $kept/$total")
    // the re-pushed predicates carry the PHYSICAL name into the
    // parquet scan — row-group pushdown, which the pre-pruning mapped
    // wrapper had to give up
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[.*GreaterThanOrEqual\\(k,.*"),
      s"physical-name pushdown missing:\n$plan")
  }

  test("aggregates and column pruning ride the pruned scan") {
    registered()
    val df = spark.sql(
      "SELECT sum(key) AS s FROM snap.lake.clustered WHERE key < 1000")
    val s = df.head().getLong(0)
    assert(s == (0L until 1000L).sum)
    val (kept, total) = lastPrune
    assert(kept < total)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("struct<key:bigint,v:bigint>"),
      s"scan must read only the asked-for column:\n$plan")
  }

  test("two bloom-indexed columns AND-compose: the intersection of both prunes") {
    registered()
    val t = s"$root/lake/twokeys"
    SnapshotLog.commit(spark, t,
      spark.range(8000).repartitionByRange(8, col("id")).select(
        ((col("id") * 7919) % 8000).as("a"),
        ((col("id") * 104729) % 8000).as("b")))
    SnapshotLog.writeBloomIndex(spark, t, "a",
      expectedItemsPerFile = 2048, fpp = 0.01)
    SnapshotLog.writeBloomIndex(spark, t, "b",
      expectedItemsPerFile = 2048, fpp = 0.01)
    // a = x names ONE row (one file); b = that row's own b-value
    // intersects to the same file; b = some OTHER row's value
    // intersects to (usually) nothing
    val row = SnapshotLog.read(spark, t)
      .filter(col("a") === 17).head()
    val hit = spark.sql(
      s"SELECT a, b FROM snap.lake.twokeys WHERE a = 17 AND b = ${row.getLong(1)}")
      .collect()
    val (kept1, total1) = lastPrune
    assert(hit.length == 1 && total1 == 8 && kept1 <= 2, s"kept $kept1/$total1")
    val other = SnapshotLog.read(spark, t)
      .filter(col("a") === 4242).head().getLong(1)
    if (other != row.getLong(1)) {
      val miss = spark.sql(
        s"SELECT a, b FROM snap.lake.twokeys WHERE a = 17 AND b = $other")
        .collect()
      val (kept2, _) = lastPrune
      assert(miss.isEmpty && kept2 <= kept1,
        s"AND of two memberships must intersect, kept $kept2")
    }
  }

  test("DESCRIBE TABLE EXTENDED surfaces the snapshot lifecycle properties") {
    registered()
    val props = spark.sql("DESCRIBE TABLE EXTENDED snap.lake.clustered")
      .filter(col("col_name") === "Table Properties")
      .head().getString(1)
    assert(props.contains("snapshot.version=0"), props)
    assert(props.contains("snapshot.files=8"), props)
    assert(props.contains("snapshot.stats=true"), props)
    assert(props.contains("snapshot.columnMapped=false"), props)
  }

  test("file pruning fires on a dv-bearing table's masked half; an all-pruned mask keeps the columnar scan") {
    registered()
    // fresh table (the shared ones must stay dv-free for the other
    // cases): 8 EXACT contiguous slices of [0, 8000) — range with an
    // explicit partition count, not repartitionByRange, whose sampled
    // boundaries wobble run-to-run — then MOR-delete key 17, landing
    // the mask on the FIRST file only
    SnapshotLog.commit(spark, s"$root/lake/masked",
      spark.range(0, 8000, 1, 8).select(
        col("id").as("key"), (col("id") * 2).as("v")))
    SnapshotLog.deleteWhereInMOR(spark, s"$root/lake/masked", "key", Seq(17L))
    // (a) a range that EXCLUDES the masked file: stats prune drops it
    // like any clean file, and with zero masked files surviving the
    // scan keeps the full COLUMNAR path (the planning-time decision)
    val df = spark.sql(
      "SELECT key, v FROM snap.lake.masked WHERE key >= 1000 AND key < 2000")
    assert(df.count() == 1000)
    val (kept1, total1) = lastPrune
    assert(total1 == 8 && kept1 <= 2, s"kept $kept1/$total1")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "an all-pruned mask should keep the vectorized handoff")
    // (b) a range that INCLUDES the masked file: still prunes to ~1
    // file, reads row-based, and the deleted key is absent
    val hit = spark.sql(
      "SELECT key FROM snap.lake.masked WHERE key < 100")
    val got = hit.collect().map(_.getLong(0)).sorted
    val (kept2, total2) = lastPrune
    assert(total2 == 8 && kept2 <= 2, s"kept $kept2/$total2")
    assert(got.length == 99 && !got.contains(17L),
      s"expected 99 rows without key 17, got ${got.length}")
    assert(!hit.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a surviving masked file must force the row-based scan")
  }

  test("a large IN list still prunes exactly (the hull + exact two-step stats stage)") {
    registered()
    // 200 keys spread over [0, 2000): the hull prunes to 2 of 8 files
    // in one pass, the exact stage confirms — and the result is exact
    val ks = (0 until 200).map(i => (i * 10).toLong)
    val inList = ks.mkString(", ")
    val n = spark.sql(
      s"SELECT count(*) AS n FROM snap.lake.clustered WHERE key IN ($inList)")
      .head().getLong(0)
    assert(n == 200)
    val (kept, total) = lastPrune
    assert(total == 8 && kept <= 2, s"kept $kept/$total")
  }
}
