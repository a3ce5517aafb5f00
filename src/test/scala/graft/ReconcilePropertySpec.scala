package graft

import scala.util.Random

import graft.migrator.{Migration, Reconcile}

/** Property-style tests the reference lacks (SURVEY §5 port strategy):
  * over randomized (seeded) ledger/dir states, the outer join partitions
  * versions into pending ∪ matched (∪ absconded ∪ tampered) correctly.
  */
class ReconcilePropertySpec extends SparkSpec {

  private val rnd = new Random(42)
  private def mk(v: Int) = Migration(v, s"V${v}__m.sql", s"h$v")

  test("pending = incoming \\ committed for clean ledgers (randomized)") {
    import spark.implicits._
    (1 to 8).foreach { _ =>
      val committedV = (1 to 30).filter(_ => rnd.nextBoolean()).toSet
      val extraV = (1 to 30).filter(_ => rnd.nextBoolean()).toSet
      val incomingV = committedV ++ extraV
      val committed = committedV.toSeq.map(mk).toDF()
      val incoming = incomingV.toSeq.map(mk).toDF()
      if (committedV.nonEmpty && incomingV.nonEmpty) {
        val pending = Reconcile.migrationsToApply(committed, incoming)
          .collect().map(_.getAs[Int]("version")).toSet
        assert(pending == incomingV -- committedV)
        // partition completeness on the joined relation
        val stat = Reconcile.executionStat(committed, incoming)
        val n = stat.count()
        val p = Reconcile.pending(stat).count()
        val abscond = Reconcile.absconded(stat).count()
        val tamper = Reconcile.tampered(stat).count()
        assert(abscond == 0 && tamper == 0)
        assert(n - p == committedV.size)
        assert(p == (incomingV -- committedV).size)
      }
    }
  }

  test("tampering any committed version is always detected (randomized)") {
    import spark.implicits._
    (1 to 8).foreach { _ =>
      val committedV = (1 to 20).filter(_ => rnd.nextBoolean()).toSet + 7
      val tamperedVersion = committedV.toSeq(rnd.nextInt(committedV.size))
      val committed = committedV.toSeq.map(mk).toDF()
      val incoming = committedV.toSeq.map { v =>
        if (v == tamperedVersion) Migration(v, s"V${v}__m.sql", "EDITED") else mk(v)
      }.toDF()
      val e = intercept[AssertionError] {
        Reconcile.migrationsToApply(committed, incoming)
      }
      assert(e.getMessage == Reconcile.TamperedMsg)
    }
  }
}
