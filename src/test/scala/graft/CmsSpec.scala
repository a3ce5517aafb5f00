package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import ops.TextOps

/** Contracts of the count-min-sketch heavy-hitter screen
  * (`text_heavy_hitters_cms` + [[graft.functions.CmsEstimate]]): exact
  * equivalence to the exact twin (the overcount + confirm theorem the
  * shared oracle also pins), the one-sided error property that theorem
  * rests on, screen selectivity (the sketch must actually screen), and
  * the analysis-error surface of the registration.
  */
class CmsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def sorted(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("CMS screen + exact confirm equals the exact heavy hitters") {
    val exact = TextOps.textHeavyHitters(spark, sfDir).collect()
    val cms = TextOps.textHeavyHittersCms(spark, sfDir).collect()
    assert(exact.nonEmpty, "fixture yields no heavy hitters — test is vacuous")
    assert(sorted(exact) == sorted(cms))
  }

  test("CMS estimates are one-sided: estimate >= true count for every item") {
    TextOps.hhItems(spark, sfDir).select("item")
      .createOrReplaceTempView("cms_spec_items")
    val bad = spark.sql("""
      WITH sk AS (SELECT count_min_sketch(xxhash64(item),
                           CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42) AS s
                  FROM cms_spec_items),
      truth AS (SELECT item, COUNT(*) AS cnt FROM cms_spec_items GROUP BY item)
      SELECT item FROM truth
      WHERE graft_cms_estimate((SELECT s FROM sk), xxhash64(item)) < cnt""")
    assert(bad.count() == 0)
  }

  test("the sketch actually screens: candidate items are few vs the vocabulary") {
    TextOps.hhItems(spark, sfDir).select("item")
      .createOrReplaceTempView("cms_spec_items")
    val vocab = spark.sql(
      "SELECT COUNT(DISTINCT item) AS n FROM cms_spec_items").head().getLong(0)
    val cand = spark.sql(s"""
      WITH sk AS (SELECT count_min_sketch(xxhash64(item),
                           CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42) AS s,
                         COUNT(*) AS n
                  FROM cms_spec_items)
      SELECT COUNT(DISTINCT item) AS n FROM cms_spec_items
      WHERE graft_cms_estimate((SELECT s FROM sk), xxhash64(item))
              * ${TextOps.HhThreshold} >= (SELECT n FROM sk)""").head().getLong(0)
    // 8 hot items qualify; eps·N additive error (~0.1% of the stream vs
    // the 3.1% threshold) leaves the ~512-item rare tail far below the
    // bar, so the candidate set should be the hot items alone — allow a
    // small collision margin, but it must be a tiny vocabulary fraction
    assert(cand >= 8, s"screen dropped a true heavy hitter: $cand candidates")
    assert(cand <= 32, s"screen not selective: $cand of $vocab items passed")
  }

  test("wrong arity raises an analysis error naming the function") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cms_estimate(CAST(NULL AS BINARY))").collect()
    }
    assert(e.getMessage.contains("graft_cms_estimate"))
  }

  test("a non-constant sketch argument is rejected at analysis") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""
        SELECT graft_cms_estimate(CAST(v AS BINARY), xxhash64(v))
        FROM VALUES ('a'), ('b') t(v)""").collect()
    }
    assert(e.getMessage.toLowerCase.contains("constant"))
  }
}
