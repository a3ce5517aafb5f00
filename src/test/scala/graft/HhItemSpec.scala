package graft

import org.apache.spark.sql.functions._

/** The native hh_item expression (r20): bit parity against the
  * oracle-mirrored SQL derivation it fuses — per token occurrence,
  * md5(concat(tk, ':', doc_id)) → 52-bit value → mod 1024 → hot_/rare_
  * item — on the real corpus and on adversarial tokens (unicode,
  * empty, delimiter-bearing). Both heavy-hitter entries derive their
  * item stream through it, so the parity here is what keeps their
  * oracle green. */
class HhItemSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The SQL fallback form, verbatim from hhItems' else-branch. */
  private def sqlItem = expr(
    """CASE WHEN pmod(cast(conv(substring(md5(concat(tk, ':', cast(doc_id as string))), 1, 13), 16, 10) as bigint), 1024) < 512
         THEN concat('hot_', cast(pmod(cast(conv(substring(md5(concat(tk, ':', cast(doc_id as string))), 1, 13), 16, 10) as bigint), 1024) div 64 as string))
         ELSE concat('rare_', cast(pmod(cast(conv(substring(md5(concat(tk, ':', cast(doc_id as string))), 1, 13), 16, 10) as bigint), 1024) as string))
       END""")

  test("hh_item matches the SQL derivation on the real corpus") {
    assert(spark.catalog.functionExists("hh_item"), "extension not loaded")
    val occ = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
    val mismatches = occ
      .select(col("doc_id"), col("tk"),
        expr("hh_item(tk, doc_id)").as("native"), sqlItem.as("sql"))
      .filter(not(col("native") <=> col("sql")))
      .count()
    assert(mismatches == 0L)
  }

  test("hh_item matches the SQL derivation on adversarial tokens") {
    import spark.implicits._
    val df = Seq(
      (0L, ""),                    // empty token (split of "" yields one)
      (1L, "café"),           // multi-byte UTF-8
      (Long.MaxValue, "x"),        // extreme doc id rendering
      (-7L, "neg id"),             // negative id + delimiter in token
      (42L, "中文token"),  // CJK prefix
      (9L, ":"),                   // colon collision shape: tk=":" vs id
      (1024L, "0123456789")
    ).toDF("doc_id", "tk")
    val rows = df.select(
      expr("hh_item(tk, doc_id)").as("native"), sqlItem.as("sql")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("hh_item null propagation matches the SQL form") {
    import spark.implicits._
    val df = Seq((Some(1L), None: Option[String]), (None, Some("tok")))
      .toDF("doc_id", "tk")
    val rows = df.select(
      expr("hh_item(tk, doc_id)").as("native"), sqlItem.as("sql")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
    }
  }
}
