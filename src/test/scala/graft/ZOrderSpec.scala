package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import ops.LayoutOps

/** Measures the layout property Z-ordering exists for: after writing
  * the SAME rows under (a) a single-column range clustering and (b) a
  * Morton-key range clustering, per-file min/max stats on the raw
  * columns admit different file-skip sets for box predicates. The
  * single-column layout is unbeatable on its own column and useless on
  * the other; the Z layout prunes on BOTH. This is exactly the
  * decision a 100 TB table owner makes between `ORDER BY (x)` and
  * `ZORDER BY (x, y)` — here it is executed and counted on real
  * parquet files instead of asserted from folklore.
  */
class ZOrderSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private val NFiles = 16

  // per-file (min,max) of x and y, read back from the written layout
  private def fileStats(path: String): Array[(Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  // files a scan with predicate x∈[bx0,bx1] ∧ y∈[by0,by1] cannot skip
  // (a one-sided bound of -1/256 disables that dimension)
  private def filesNeeded(stats: Array[(Long, Long, Long, Long)],
      bx0: Long, bx1: Long, by0: Long, by1: Long): Int =
    stats.count { case (x0, x1, y0, y1) =>
      x1 >= bx0 && x0 <= bx1 && y1 >= by0 && y0 <= by1
    }

  private lazy val keyed: DataFrame =
    LayoutOps.layoutZorderKey(spark, sfDir).cache()

  private lazy val statsLinear: Array[(Long, Long, Long, Long)] = {
    val p = s"$scratch/layout_linear"
    keyed.repartitionByRange(NFiles, col("x")).write.mode("overwrite").parquet(p)
    fileStats(p)
  }

  private lazy val statsZ: Array[(Long, Long, Long, Long)] = {
    val p = s"$scratch/layout_z"
    keyed.repartitionByRange(NFiles, col("z")).write.mode("overwrite").parquet(p)
    fileStats(p)
  }

  test("the Morton key interleaves bits correctly (spot values)") {
    // (x=3, y=5): x bits 11 -> positions 0,2; y bits 101 -> positions 1,3,5
    // z = 1 + 2 + 4 + 32 = 0b100111 = 39
    val row = spark.sql(
      s"SELECT ${LayoutOps.zOrderSparkSql("3", "5", 8)} AS z").head()
    assert(row.getLong(0) == 39L)
    // identity on the axes: (x, 0) maps to spread-x, (0, y) to 2*spread-y
    val axes = spark.sql(s"""SELECT
      ${LayoutOps.zOrderSparkSql("255", "0", 8)} AS zx,
      ${LayoutOps.zOrderSparkSql("0", "255", 8)} AS zy""").head()
    assert(axes.getLong(0) * 2 == axes.getLong(1))
    // bijectivity over the full 16-bit domain on the fixture rows
    assert(keyed.filter(col("z") < 0 || col("z") > 65535).count() == 0)
  }

  test("both layouts produced the expected file count with non-degenerate stats") {
    assert(statsLinear.length == NFiles && statsZ.length == NFiles)
    // x-clustered files must have tight x ranges (~256/16 wide)
    assert(statsLinear.forall { case (x0, x1, _, _) => x1 - x0 <= 32 })
  }

  test("single-column layout: perfect on its column, zero pruning on the other") {
    val onX = filesNeeded(statsLinear, 32, 63, 0, 255)
    val onY = filesNeeded(statsLinear, 0, 255, 96, 127)
    assert(onX <= 4, s"x-clustered layout should prune an x-box hard, needed $onX")
    assert(onY >= NFiles - 1,
      s"x-clustered layout cannot prune a y-box — expected ~$NFiles, got $onY")
  }

  test("Z layout prunes on BOTH dimensions and hardest on the 2-d box") {
    val onX = filesNeeded(statsZ, 32, 63, 0, 255)
    val onY = filesNeeded(statsZ, 0, 255, 96, 127)
    val on2d = filesNeeded(statsZ, 32, 63, 96, 127)
    val linearY = filesNeeded(statsLinear, 0, 255, 96, 127)
    // 16 z-range files ≈ a 4×4 grid of 64×64 tiles: a 32-wide stripe in
    // either dimension touches ~one row/column of tiles (+ boundary slop)
    assert(onX <= 8, s"z layout x-box needed $onX of $NFiles")
    assert(onY <= 8, s"z layout y-box needed $onY of $NFiles")
    assert(onY < linearY, "z layout must beat the x-clustered layout on y predicates")
    assert(on2d <= 4, s"z layout 2-d box needed $on2d of $NFiles")
    assert(on2d <= onX && on2d <= onY)
  }

  test("OPTIMIZE ZORDER BY through the snapshot log: manifest stats prune on either dimension") {
    // the verb, not just the layout: commit the same rows round-robin
    // (pruning-hostile), optimize(zOrderBy), and ask the MANIFEST's own
    // stats (pruneFiles — what catalog scans and readWhere consult) a
    // box question per dimension; rows must survive the rewrite exactly
    import sources.SnapshotLog
    val t = s"$scratch/lake_zorder/t"
    val rows = keyed.select("l_orderkey", "l_linenumber", "x", "y")
    SnapshotLog.commit(spark, t, rows.repartition(NFiles))
    val (k0x, tot0) = SnapshotLog.pruneFiles(t, "x", Some(32L), Some(63L))
    assert(k0x.size == tot0, "round-robin layout should prune nothing")
    SnapshotLog.optimize(spark, t,
      targetRecordsPerFile = math.max(1L, rows.count() / NFiles),
      zOrderBy = Seq("x", "y"))
    val (kx, tx) = SnapshotLog.pruneFiles(t, "x", Some(32L), Some(63L))
    val (ky, ty) = SnapshotLog.pruneFiles(t, "y", Some(96L), Some(127L))
    assert(kx.size <= tx / 2, s"x-box kept ${kx.size}/$tx after ZORDER")
    assert(ky.size <= ty / 2, s"y-box kept ${ky.size}/$ty after ZORDER")
    // semantics invisible: the rewrite is the same multiset of rows
    assert(SnapshotLog.read(spark, t).count() == rows.count())
    assert(SnapshotLog.readWhere(spark, t, "x", Some(32L), Some(63L)).count()
      == rows.filter(col("x").between(32, 63)).count())
    // guardrails: both layouts at once, wrong arity, non-numeric
    intercept[IllegalArgumentException] {
      SnapshotLog.optimize(spark, t, 1000L,
        clusterBy = Seq("x"), zOrderBy = Seq("x", "y"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.optimize(spark, t, 1000L, zOrderBy = Seq("x"))
    }
  }

  test("quantile bucketing repairs ZORDER pruning under a zipf-skewed dimension") {
    // y is heavy-tailed (zipf-ish: y = 1e6 / (1 + rank), ranks cycling
    // uniformly): the LINEAR 256-cell map packs ~80% of rows into cell
    // 0 (the outliers stretch the domain), so after ZORDER every file
    // holding cell-0 rows spans the whole low-y value range and a
    // median-band ask keeps ~all files; the QUANTILE map buckets by
    // rank, keeping cells population-balanced, and the same ask prunes
    // to a y-row of the morton grid
    import sources.SnapshotLog
    val t = s"$scratch/lake_zorder_zipf/t"
    val n = 32000L
    val rows = spark.range(n).select(
      ((col("id") * 7919) % 256).as("x"),
      floor(lit(1000000.0) / ((col("id") % 1000) + 1)).cast("long").as("y"))
    SnapshotLog.commit(spark, t, rows.repartition(NFiles))
    // ~3% of rows around the median — centered INSIDE one quantile
    // y-stripe (cells ~141-147): a band straddling the top-level
    // morton split at cell 128 would legitimately touch two tile rows
    val band = (1710L, 1810L)
    val bandRows = rows.filter(col("y").between(band._1, band._2)).count()
    assert(bandRows > 0)
    SnapshotLog.optimize(spark, t, targetRecordsPerFile = n / NFiles,
      zOrderBy = Seq("x", "y"))
    val (kLin, tLin) = SnapshotLog.pruneFiles(
      t, "y", Some(band._1), Some(band._2))
    // linear map under skew: the band is inside cell 0 with ~80% of
    // all rows — pruning has collapsed
    assert(kLin.size >= tLin * 3 / 4,
      s"expected the linear map to keep ~all files under skew, " +
        s"kept ${kLin.size}/$tLin")
    SnapshotLog.optimize(spark, t, targetRecordsPerFile = n / NFiles,
      zOrderBy = Seq("x", "y"), zOrderQuantile = true)
    val (kQ, tQ) = SnapshotLog.pruneFiles(t, "y", Some(band._1), Some(band._2))
    assert(kQ.size <= kLin.size / 2,
      s"quantile bucketing should keep <= half the linear map's files: " +
        s"${kQ.size}/$tQ vs ${kLin.size}/$tLin")
    // the layouts are semantics-invisible: same band count either way
    assert(SnapshotLog.readWhere(spark, t, "y",
      Some(band._1), Some(band._2)).count() == bandRows)
    assert(SnapshotLog.read(spark, t).count() == n)
    // guardrail: the quantile flag without dimensions is a loud no
    intercept[IllegalArgumentException] {
      SnapshotLog.optimize(spark, t, 1000L, zOrderQuantile = true)
    }
  }

  test("3-D ZORDER: the n-dim Morton interleave prunes on EVERY dimension, hardest on the 3-d box") {
    // spot values first: n=3 puts bit i of dim d at position 3i+d
    val spot = spark.sql(s"""SELECT
      ${LayoutOps.zOrderSparkSqlN(Seq("1", "1", "1"), 8)} AS a,
      ${LayoutOps.zOrderSparkSqlN(Seq("2", "0", "1"), 8)} AS b""").head()
    assert(spot.getLong(0) == 7L)  // bits at positions 0,1,2
    assert(spot.getLong(1) == 12L) // x bit1 -> pos 3; w bit0 -> pos 2
    // (the 2-D spot test above pins zOrderSparkSql's historical values,
    // and it now delegates to the n=2 case — one arithmetic, two arities)

    import sources.SnapshotLog
    val t = s"$scratch/lake_zorder_3d/t"
    val n = 32000L
    // three roughly independent uniform dims (co-prime multipliers)
    val rows = spark.range(n).select(
      ((col("id") * 7919) % 256).as("x"),
      ((col("id") * 104729) % 256).as("y"),
      ((col("id") * 1299709) % 256).as("w"))
    SnapshotLog.commit(spark, t, rows.repartition(NFiles))
    assert(SnapshotLog.pruneFiles(t, "x", Some(128L), Some(255L))._1.size
      == NFiles, "round-robin layout should prune nothing")
    SnapshotLog.optimize(spark, t, targetRecordsPerFile = n / NFiles,
      zOrderBy = Seq("x", "y", "w"))
    // 16 z-range files over a 24-bit key split on the top interleaved
    // bits (w7, y7, x7, w6): a top-half ask on ANY dimension keeps
    // about half the files (+ boundary slop), and w — owning two of
    // the four split bits — prunes a top-quarter ask to ~4
    val (kx, tx) = SnapshotLog.pruneFiles(t, "x", Some(128L), Some(255L))
    val (ky, _) = SnapshotLog.pruneFiles(t, "y", Some(128L), Some(255L))
    val (kw, _) = SnapshotLog.pruneFiles(t, "w", Some(192L), Some(255L))
    assert(tx == NFiles, s"expected $NFiles files, got $tx")
    assert(kx.size <= 11, s"x top-half ask kept ${kx.size}/$tx")
    assert(ky.size <= 11, s"y top-half ask kept ${ky.size}/$tx")
    assert(kw.size <= 8, s"w top-quarter ask kept ${kw.size}/$tx")
    // the 3-d box composes: intersect the per-dimension keeps (what a
    // conjunctive scan prune computes) — strictly harder than any
    // single dimension
    val box = kx.toSet & ky.toSet & kw.toSet
    assert(box.size <= 6 && box.size <= Seq(kx.size, ky.size, kw.size).min,
      s"3-d box kept ${box.size} files")
    // semantics invisible: same multiset, exact filter counts
    assert(SnapshotLog.read(spark, t).count() == n)
    assert(SnapshotLog.readWhere(spark, t, "w", Some(192L), Some(255L))
      .count() == rows.filter(col("w") >= 192).count())
    // guardrail: 5 dims refuse (the useful ceiling is documented)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.optimize(spark, t, 1000L,
        zOrderBy = Seq("x", "y", "w", "x", "y"))
    }
    assert(e.getMessage.contains("2 to 4"), e.getMessage)
  }
}
