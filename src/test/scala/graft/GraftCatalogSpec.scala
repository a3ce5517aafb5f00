package graft

import org.apache.spark.sql.functions.col

/** DSv2 TableCatalog plugin (`graft.sources.GraftCatalog`): runtime
  * registration via session conf, namespace/table listing from the
  * testdata layout, catalog-resolved scans planning through Spark's V2
  * parquet stack (pushdown + pruning intact), cross-namespace joins,
  * and the read-only write contract.
  */
class GraftCatalogSpec extends SparkSpec {

  private def registered() = {
    spark.conf.set("spark.sql.catalog.tdata", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tdata.root", "/root/testdata")
  }

  test("namespaces and tables resolve from the directory layout") {
    registered()
    // SHOW quotes identifiers containing dots — strip the backticks
    val ns = spark.sql("SHOW NAMESPACES IN tdata").collect()
      .map(_.getString(0).stripPrefix("`").stripSuffix("`"))
    assert(ns.contains("sf0.01"), ns.mkString(","))
    val tables = spark.sql("SHOW TABLES IN tdata.`sf0.01`").collect().map(_.getString(1))
    assert(Set("lineitem", "orders", "documents", "embeddings").subsetOf(tables.toSet),
      tables.mkString(","))
  }

  test("catalog-resolved scans match path reads and keep parquet pushdown") {
    registered()
    val viaCatalog = spark.sql(
      "SELECT count(*) FROM tdata.`sf0.01`.lineitem WHERE l_quantity > 45").head.getLong(0)
    val viaPath = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .filter("l_quantity > 45").count()
    assert(viaCatalog == viaPath && viaCatalog > 0)
    val df = spark.sql(
      "SELECT l_orderkey FROM tdata.`sf0.01`.lineitem WHERE l_quantity > 45")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]")
      || plan.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(l_quantity.*"), plan)
    // pruning: the scan schema must not carry untouched wide columns
    assert(!plan.contains("l_returnflag"), plan)
  }

  test("cross-namespace join plans as ordinary v2 scans") {
    registered()
    val n = spark.sql(
      """SELECT count(*) FROM tdata.`sf0.001`.orders o
         JOIN tdata.`sf0.001`.customer c ON o.o_custkey = c.c_custkey""").head.getLong(0)
    val expect = {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      o.join(c, o("o_custkey") === c("c_custkey")).count()
    }
    assert(n == expect && n > 0)
  }

  test("the catalog is read-only with an explanatory error") {
    registered()
    val e = intercept[Exception] {
      spark.sql("DROP TABLE tdata.`sf0.001`.orders")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.isInstanceOf[UnsupportedOperationException] &&
      c.getMessage.contains("read-only")), e.toString)
  }

  test("a partitioned sink layout mounts as a catalog table with partition pruning") {
    // CorpusSink writes lang-partitioned parquet; mounted through the
    // catalog, a lang predicate must prune PARTITIONS (directory-level
    // skip), not just push a row filter — the read path a per-language
    // downstream job takes at 100 TB
    val root = s"$scratch/cat_root"
    graft.sources.CorpusSink.writeCurated(
      spark, "/root/testdata/sf0.001", s"$root/curated/docs.parquet")
    spark.conf.set("spark.sql.catalog.sink", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sink.root", root)
    val df = spark.sql("SELECT doc_id FROM sink.curated.docs WHERE lang = 'en'")
    val viaPath = spark.read.parquet(s"$root/curated/docs.parquet")
      .filter(col("lang") === "en").count()
    assert(df.count() == viaPath && viaPath > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[.*lang.*"), plan)
  }

  test("missing namespaces and tables raise the standard analysis errors") {
    registered()
    assertThrows[Exception](spark.sql("SHOW TABLES IN tdata.nope").collect())
    assertThrows[Exception](spark.sql("SELECT * FROM tdata.`sf0.01`.nope").collect())
  }
}
