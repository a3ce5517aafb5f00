package graft

import graft.migrator.{Migration, Reconcile}

/** 1:1 port of the reference's migrations_to_apply unit tests
  * (reference: tests/test_clickhouse_migration.py:27-59) plus edge cases.
  */
class ReconcileSpec extends SparkSpec {

  private def df(ms: Migration*) = {
    import spark.implicits._
    ms.toDF()
  }
  private def emptyDf = df()

  // reference tests:27-30 — empty incoming + empty ledger → no-op
  test("empty committed returns incoming as-is") {
    val incoming = df(Migration(1, "loc", "1234"))
    val out = Reconcile.migrationsToApply(emptyDf, incoming)
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("both empty → empty pending") {
    assert(Reconcile.migrationsToApply(emptyDf, emptyDf).isEmpty)
  }

  // reference tests:33-37 — all migrations deleted from disk
  test("deleted migrations raise missing error") {
    val committed = df(Migration(1, "location_to_script", "1234"))
    val e = intercept[AssertionError] {
      Reconcile.migrationsToApply(committed, emptyDf)
    }
    assert(e.getMessage == Reconcile.MissingMsg)
  }

  // reference tests:40-44 — committed version absent on disk
  test("missing migration raises") {
    val committed = df(Migration(1, "location_to_script", "1234"))
    val incoming = df(Migration(2, "location_to_script_2", "5678"))
    val e = intercept[AssertionError] {
      Reconcile.migrationsToApply(committed, incoming)
    }
    assert(e.getMessage == Reconcile.MissingMsg)
  }

  // reference tests:47-51 — tampered md5
  test("tampered migration raises") {
    val committed = df(Migration(1, "location_to_script", "1234"))
    val incoming = df(Migration(1, "location_to_script", "12345"))
    val e = intercept[AssertionError] {
      Reconcile.migrationsToApply(committed, incoming)
    }
    assert(e.getMessage == Reconcile.TamperedMsg)
  }

  // reference tests:54-59 — pending set computation
  test("pending set is incoming minus committed") {
    val committed = df(Migration(1, "location_to_script", "1234"))
    val incoming = df(
      Migration(1, "location_to_script", "1234"),
      Migration(2, "location_to_script_2", "5678"))
    val out = Reconcile.migrationsToApply(committed, incoming).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("version") == 2)
    assert(out(0).getAs[String]("script") == "location_to_script_2")
    assert(out(0).getAs[String]("md5") == "5678")
  }

  test("anti-join formulation agrees with outer-join formulation") {
    val committed = df((1 to 40).map(i => Migration(i, s"V${i}__m.sql", s"h$i")): _*)
    val incoming = df((1 to 65).map(i => Migration(i, s"V${i}__m.sql", s"h$i")): _*)
    val viaOuter = Reconcile.migrationsToApply(committed, incoming)
      .select("version").collect().map(_.getInt(0)).sorted.toSeq
    val viaAnti = Reconcile.pendingAntiJoin(committed, incoming)
      .select("version").collect().map(_.getInt(0)).sorted.toSeq
    assert(viaOuter == (41 to 65))
    assert(viaAnti == viaOuter)
  }

  test("version cast tolerates string-typed versions (astype parity)") {
    // reference: migrate.py:32-33 casts both sides to int32 before joining
    val committed = spark.createDataFrame(Seq(("1", "a", "h1"))).toDF("version", "script", "md5")
    val incoming = df(Migration(1, "a", "h1"), Migration(2, "b", "h2"))
    val out = Reconcile.migrationsToApply(committed, incoming).collect()
    assert(out.map(_.getAs[Int]("version")).toSeq == Seq(2))
  }
}
