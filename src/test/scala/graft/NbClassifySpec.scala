package graft

/** Measured contracts of the in-engine Naive Bayes classifier
  * (`text_nb_classify`, planted-marker supervision): the model must
  * actually LEARN (held-out accuracy ≈ 1.0 against a 0.5 base rate —
  * the markers are perfect predictors, so anything below ~0.95 means a
  * broken count join, smoothing, or scoring sum, not a hard task), the
  * split must hold out a real fraction, and the integer scoring must
  * be bit-identical across runs (the exactness the micro-integer
  * design buys over a double Σln).
  */
class NbClassifySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = SparkEntry.queries("text_nb_classify")(spark, dir).collect()

  test("both classes are populated and the test split is a real fraction") {
    val byClass = rows.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    assert(byClass.keySet == Set("pos", "neg"), byClass.toString)
    assert(byClass.values.forall(_ > 100), s"degenerate class balance: $byClass")
    val testN = rows.count(_.getLong(1) == 1L)
    assert(testN > 50 && testN < rows.length / 2,
      s"test split $testN of ${rows.length} — expected ≈20%")
  }

  test("held-out accuracy recovers the planted markers (≥ 0.95 vs 0.5 base)") {
    def acc(isTest: Long): Double = {
      val s = rows.filter(_.getLong(1) == isTest)
      s.count(_.getLong(5) == 1L).toDouble / s.length
    }
    val (trainAcc, testAcc) = (acc(0L), acc(1L))
    info(f"NB train acc = $trainAcc%.3f, test acc = $testAcc%.3f")
    assert(trainAcc >= 0.95, f"train accuracy $trainAcc%.3f")
    assert(testAcc >= 0.95, f"TEST accuracy $testAcc%.3f — model failed to generalize")
  }

  test("integer scoring is bit-identical across independent runs") {
    val again = SparkEntry.queries("text_nb_classify")(spark, dir).collect()
    val a = rows.map(r => (r.getLong(0), r.getLong(2))).toMap
    val b = again.map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(a == b, "score_micro differs across runs — exactness regressed")
  }

  test("scores separate the classes with a wide margin, not boundary luck") {
    // two markers × |lr| ≫ noise: the minimum |score| over correct
    // rows should be far from the 0 decision boundary
    val margins = rows.filter(_.getLong(5) == 1L).map(r => math.abs(r.getLong(2)))
    assert(margins.min > 100000L, // > 0.1 in log-prob units
      s"minimum |score_micro| ${margins.min} — decisions are boundary-fragile")
  }
}
