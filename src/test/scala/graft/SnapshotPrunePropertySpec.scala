package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import sources.SnapshotLog

/** Randomized (seeded) equivalence tests for the whole prune family —
  * the ReconcilePropertySpec discipline pointed at this round's most
  * safety-critical code: for RANDOM tables (key type, layout,
  * null fraction, second generations, bloom index or not) and RANDOM
  * asks (membership lists mixing present/absent keys and crossing the
  * hull threshold; ranges with either/both bounds, inside and outside
  * the domain), a pruned read must equal the unpruned read + exact
  * filter, row for row. The fixture-derived suites pin engineered
  * shapes; this sweeps the combinations nobody thought to engineer —
  * including non-ASCII string keys (whose stats the harvest must drop
  * rather than mis-prune) and the membership hull on every key type.
  */
class SnapshotPrunePropertySpec extends SparkSpec {

  private val rnd = new Random(20260815)

  private def randTable(t: String, keyKind: Int): (Seq[Any], Long) = {
    val n = 200 + rnd.nextInt(1800)
    val parts = 1 + rnd.nextInt(8)
    val keyExpr = keyKind match {
      case 0 => col("id")                              // clustered long
      case 1 => (col("id") * 7919) % n                 // unclustered long
      case 2 => concat(lit("k"), lpad(col("id").cast("string"), 6, "0"))
      case 3 => // strings with a non-ASCII tail on ~half the rows:
        // those files' string stats are DROPPED by the harvest
        concat(lit("k"), col("id").cast("string"),
          when(col("id") % 2 === 0, lit("é")).otherwise(lit("")))
      case 4 => date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        ((col("id") * 37) % 4000).cast("int"))
      case _ => ((col("id") * 131) % n).cast("int")    // unclustered int
    }
    val df = spark.range(n).repartitionByRange(parts, col("id")).select(
      keyExpr.as("key"),
      when(col("id") % (2 + rnd.nextInt(5)) =!= 0, col("id") * 3).as("v"))
    SnapshotLog.commit(spark, t, df)
    if (rnd.nextBoolean()) { // second generation, disjoint ids
      val extra = spark.range(n, n + n / 3)
        .repartitionByRange(1 + rnd.nextInt(3), col("id")).select(
          keyExpr.as("key"), (col("id") * 3).as("v"))
      SnapshotLog.commitAppend(spark, t, extra)
    }
    if (rnd.nextBoolean())
      SnapshotLog.writeBloomIndex(spark, t, "key",
        expectedItemsPerFile = 4096, fpp = 0.02)
    // the present-key pool, straight from the committed table
    val present = SnapshotLog.read(spark, t).select("key")
      .limit(500).collect().map(_.get(0)).toSeq
    (present, n.toLong)
  }

  private def absentKey(keyKind: Int, n: Long, i: Int): Any = keyKind match {
    case 0 | 1 => -1000L - i
    case 2 | 3 => s"zz_absent_$i"
    case 4     => java.sql.Date.valueOf("1970-01-02")
    case _     => (-1000 - i)
  }

  test("membership and range prunes equal the unpruned read on random tables and asks") {
    for (trial <- 0 until 12) {
      val keyKind = trial % 6
      val t = s"$scratch/prop_$trial"
      val (present, n) = randTable(t, keyKind)
      // membership asks: sizes crossing the hull threshold (4), mixing
      // present and absent keys
      for (asks <- 0 until 3) {
        val size = 1 + rnd.nextInt(30)
        val vs: Seq[Any] = (0 until size).map { i =>
          if (rnd.nextInt(4) == 0) absentKey(keyKind, n, i)
          else present(rnd.nextInt(present.size))
        }.distinct
        val got = SnapshotLog.readWhereIn(spark, t, "key", vs)
          .collect().map(_.toString).sorted.toSeq
        val want = SnapshotLog.read(spark, t).filter(col("key").isin(vs: _*))
          .collect().map(_.toString).sorted.toSeq
        assert(got == want,
          s"trial $trial keyKind $keyKind membership $vs: " +
            s"${got.size} vs ${want.size} rows")
        // observability sanity: kept ⊆ total and the result needs no
        // file the prune dropped (equality above already proves it)
        val (kept, total) = SnapshotLog.bloomPruneFiles(spark, t, "key", vs)
        assert(kept.size <= total)
      }
      // range asks on the orderable kinds (strings order lexically —
      // valid for the k-prefixed pool; dates/longs by value)
      if (keyKind != 3) for (asks <- 0 until 2) {
        val a = present(rnd.nextInt(present.size))
        val b = present(rnd.nextInt(present.size))
        val (lo, hi) = if (rnd.nextBoolean()) (Some(a), Some(b))
          else if (rnd.nextBoolean()) (Some(a), None) else (None, Some(b))
        val got = SnapshotLog.readWhere(spark, t, "key", lo, hi)
          .collect().map(_.toString).sorted.toSeq
        val preds = lo.map(l => col("key") >= lit(l)) ++
          hi.map(u => col("key") <= lit(u))
        val want = preds.reduceOption(_ && _)
          .map(SnapshotLog.read(spark, t).filter)
          .getOrElse(SnapshotLog.read(spark, t))
          .collect().map(_.toString).sorted.toSeq
        assert(got == want,
          s"trial $trial keyKind $keyKind range [$lo, $hi]: " +
            s"${got.size} vs ${want.size} rows")
      }
    }
  }

  test("point deletes equal the filter complement on random tables") {
    for (trial <- 0 until 4) {
      val keyKind = Seq(1, 2, 4, 5)(trial)
      val t = s"$scratch/prop_del_$trial"
      val (present, n) = randTable(t, keyKind)
      val vs: Seq[Any] = (0 until 1 + rnd.nextInt(6)).map { i =>
        if (i == 0) absentKey(keyKind, n, i)
        else present(rnd.nextInt(present.size))
      }.distinct
      val want = SnapshotLog.read(spark, t).filter(!col("key").isin(vs: _*)
          || col("key").isNull)
        .collect().map(_.toString).sorted.toSeq
      SnapshotLog.deleteWhereIn(spark, t, "key", vs)
      val got = SnapshotLog.read(spark, t)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want,
        s"del trial $trial keyKind $keyKind keys $vs: " +
          s"${got.size} vs ${want.size} rows")
    }
  }
}
