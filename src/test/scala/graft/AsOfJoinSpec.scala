package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsOf, AsOfJoinExec}

/** Custom AsOfJoin operator: planner integration, correctness against
  * the window-based formulation, and edge cases. */
class AsOfJoinSpec extends SparkSpec {

  private def events(sf: String) = {
    val raw = spark.read.parquet(s"/root/testdata/sf$sf/events.parquet")
    ops.EventOps.normalizeTs(raw, raw.schema("ts").dataType)
      .withColumn("us", expr("unix_micros(ts)")) // any encoding → µs long
  }

  test("plans through the injected strategy as AsOfJoinExec") {
    val purchases = events("0.001").filter("event_type = 'purchase'")
      .select(col("event_id"), col("user_id"), col("us"))
    val signups = events("0.001").filter("event_type = 'signup'")
      .select(col("event_id").as("s_event_id"), col("user_id").as("s_user_id"),
        col("us").as("s_us"))
    val joined = AsOf.join(purchases, signups,
      "user_id", "s_user_id", "us", "s_us")
    val hasExec = joined.queryExecution.executedPlan.collectFirst {
      case e: AsOfJoinExec => e
    }.isDefined ||
      joined.queryExecution.executedPlan.toString.contains("AsOfJoin")
    assert(hasExec, joined.queryExecution.executedPlan.toString)
  }

  test("matches the window-based as-of formulation on real data") {
    val ev = events("0.01")
    val purchases = ev.filter("event_type = 'purchase'")
      .select(col("event_id"), col("user_id"), col("us"))
    val signups = ev.filter("event_type = 'signup'")
      .select(col("event_id").as("s_event_id"), col("user_id").as("s_user_id"),
        col("us").as("s_us"))
    val custom = AsOf.join(purchases, signups, "user_id", "s_user_id", "us", "s_us")
      .select(col("event_id"), col("s_event_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // window twin (the shape asof_join_signup uses, oracle-checked)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val windowed = ev.filter(col("event_type").isin("signup", "purchase"))
      .withColumn("last_signup_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_signup_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(custom.size == windowed.size)
    assert(custom == windowed)
    assert(custom.valuesIterator.exists(_ == -1L) ||
      custom.valuesIterator.forall(_ >= 0)) // sanity: nulls representable
  }

  // --- AsOfWindowRewrite: the window idiom auto-plans as the native exec ---

  // parquet roundtrip: over a LocalRelation the optimizer folds the
  // case-when projection into the scan before the rewrite can see it —
  // real sources (the only place the rewrite matters) keep the Project
  private lazy val tinyEvents = {
    import spark.implicits._
    Seq(
      (1L, 10L, 100L, "signup"), (2L, 10L, 200L, "purchase"),
      (3L, 20L, 50L, "purchase"), (4L, 10L, 300L, "purchase"))
      .toDF("event_id", "user_id", "us", "event_type")
      .write.mode("overwrite").parquet(s"$scratch/tiny_events")
    spark.read.parquet(s"$scratch/tiny_events")
  }

  private def windowIdiom(df: org.apache.spark.sql.DataFrame,
      winMarker: String = "signup", filterMarker: String = "purchase",
      agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => last(c, ignoreNulls = true)) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("last_id",
        agg(when(col("event_type") === winMarker, col("event_id"))).over(w))
      .filter(col("event_type") === filterMarker)
      .select(col("event_id"), col("last_id"))
  }

  test("window as-of idiom auto-rewrites to AsOfJoinExec (catalog query too)") {
    val q = windowIdiom(tinyEvents)
    assert(q.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      q.queryExecution.executedPlan.toString)
    val got = q.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(2L -> 1L, 3L -> -1L, 4L -> 1L))
    // the real catalog query (project-interleaved two-window chain)
    val cat = graft.ops.EventOps.asofJoinSignup(spark, "/root/testdata/sf0.001")
    assert(cat.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      cat.queryExecution.executedPlan.toString)
    assert(cat.count() > 0)
  }

  test("rewrite declines non-as-of windows (negative cases)") {
    // same marker on both sides: left rows would feed the carried value
    val same = windowIdiom(tinyEvents, winMarker = "purchase")
    assert(!same.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    // max() is not last(): not a carry-forward
    val notLast = windowIdiom(tinyEvents, agg = c => max(c))
    assert(!notLast.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    // and both still compute (through the plain window path)
    assert(same.count() == 3 && notLast.count() == 3)
  }

  test("rewrite reproduces window tiebreak semantics on (key,time) ties") {
    import spark.implicits._
    // signup 5 TIES purchase 2 on (user,us) but sorts after it by
    // event_id — the window form must not show it to purchase 2, and
    // must show it to purchase 9. A ties-included as-of without the
    // tiebreak column would wrongly hand signup 5 to purchase 2.
    Seq(
      (1L, 10L, 100L, "signup"), (2L, 10L, 200L, "purchase"),
      (5L, 10L, 200L, "signup"), (9L, 10L, 200L, "purchase"),
      (3L, 20L, 50L, "purchase"))
      .toDF("event_id", "user_id", "us", "event_type")
      .write.mode("overwrite").parquet(s"$scratch/tied_events")
    val q = windowIdiom(spark.read.parquet(s"$scratch/tied_events"))
    // the rewrite still fires (tiebreak carried, not declined)…
    assert(q.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      q.queryExecution.executedPlan.toString)
    // …and the answer is the window's exact lexicographic one
    val got = q.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(2L -> 1L, 9L -> 5L, 3L -> -1L), got.toString)
  }

  test("rewrite declines non-ascending or nulls-last tiebreakers") {
    def idiom(order: Seq[org.apache.spark.sql.Column]) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(order: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      tinyEvents.withColumn("last_id",
          last(when(col("event_type") === "signup", col("event_id")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("last_id"))
    }
    val desc = idiom(Seq(col("us"), col("event_id").desc))
    assert(!desc.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val nullsLast = idiom(Seq(col("us"), col("event_id").asc_nulls_last))
    assert(!nullsLast.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    // both still compute through the plain window path
    assert(desc.count() == 3 && nullsLast.count() == 3)
  }

  test("AsOf.join with explicit tiebreak columns uses the lexicographic order") {
    import spark.implicits._
    val l = Seq((1L, 10L, 200L, 2L), (2L, 10L, 200L, 9L))
      .toDF("lid", "k", "t", "seq")
    val r = Seq((101L, 10L, 200L, 5L), (102L, 10L, 100L, 1L))
      .toDF("rid", "rk", "rt", "rseq")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt", Seq("seq"), Seq("rseq"))
      .select("lid", "rid")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // (200,5) > (200,2) → lid 1 only sees (100,1); (200,5) <= (200,9) → lid 2 sees it
    assert(out == Map(1L -> 102L, 2L -> 101L), out.toString)
  }

  test("property: rewrite matches the lexicographic window spec on random tie-heavy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // small us range over few users → plenty of cross-marker (key,us)
      // ties, the exact regime the tiebreak semantics exist for
      val rows = (1L to 200L).map { id =>
        (id, 1L + rnd.nextInt(5), rnd.nextInt(12).toLong,
          if (rnd.nextBoolean()) "signup" else "purchase")
      }
      rows.toDF("event_id", "user_id", "us", "event_type")
        .write.mode("overwrite").parquet(s"$scratch/prop_events_$trial")
      val q = windowIdiom(spark.read.parquet(s"$scratch/prop_events_$trial"))
      assert(q.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      val got = q.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // driver-side spec: last signup strictly-lex-<= the purchase by
      // (us, event_id) within the same user
      val byId = rows.map(r => r._1 -> r).toMap
      val expected = rows.filter(_._4 == "purchase").map { p =>
        val eligible = rows.filter(m => m._4 == "signup" && m._2 == p._2 &&
          (m._3 < p._3 || (m._3 == p._3 && m._1 <= p._1)))
        p._1 -> (if (eligible.isEmpty) -1L
                 else eligible.maxBy(m => (m._3, m._1))._1)
      }.toMap
      assert(got == expected,
        s"trial $trial: ${got.toSeq.diff(expected.toSeq).take(5)} vs expected ${expected.toSeq.diff(got.toSeq).take(5)} (events ${byId.size})")
    }
  }

  test("left rows before any right row get nulls; ties match") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 50L), (4L, 99L, 10L))
      .toDF("lid", "k", "t")
    val r = Seq((101L, 10L, 150L), (102L, 10L, 200L), (103L, 20L, 60L))
      .toDF("rid", "rk", "rt")
    val out = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select("lid", "rid")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out == Map(
      1L -> -1L,   // t=100 before first right (150)
      2L -> 102L,  // tie rt=200 <= t=200 matches, latest wins
      3L -> -1L,   // t=50 before rt=60
      4L -> -1L))  // key with no right rows
  }

  test("joinWithTolerance nulls out the one match exactly when it misses the bound") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 500L), (3L, 10L, 1000L), (4L, 20L, 50L))
      .toDF("lid", "k", "t")
    val r = Seq((101L, 10L, 90L), (102L, 10L, 460L)).toDF("rid", "rk", "rt")
    // tolerance 50: lid1 matches 101 (gap 10), lid2 matches 102 (gap
    // 40), lid3's best match is 102 at gap 540 — too stale, and no
    // fresher match can exist (the as-of already picked the latest);
    // lid4 has no right rows at all. ALL right columns null together.
    val out = AsOf.joinWithTolerance(l, r, "k", "rk", "t", "rt", toleranceMicros = 50L)
      .select("lid", "rid", "rt")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1),
          if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
    assert(out == Map(
      1L -> (101L, 90L),
      2L -> (102L, 460L),
      3L -> (-1L, -1L),
      4L -> (-1L, -1L)))
    // tolerance 0: only an exact-time match survives
    val exact = AsOf.joinWithTolerance(
      l, r.withColumn("rt", col("rt") + lit(10L)), // 101 now at t=100
      "k", "rk", "t", "rt", toleranceMicros = 0L)
      .select("lid", "rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(exact == Map(1L -> 101L, 2L -> -1L, 3L -> -1L, 4L -> -1L))
  }

  test("joinForward picks the smallest right time at-or-after, nulls when none follows") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 10L, 150L), (3L, 10L, 500L), (4L, 20L, 50L))
      .toDF("lid", "k", "t")
    val r = Seq((101L, 10L, 150L), (102L, 10L, 400L)).toDF("rid", "rk", "rt")
    val out = AsOf.joinForward(l, r, "k", "rk", "t", "rt")
      .select("lid", "rt")
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out == Map(
      1L -> 150L,  // next at-or-after 100
      2L -> 150L,  // exact-time match is eligible (rt >= lt)
      3L -> -1L,   // nothing after 500
      4L -> -1L))  // key with no right rows
    // the left time column comes back un-negated
    val ts = AsOf.joinForward(l, r, "k", "rk", "t", "rt")
      .select("lid", "t").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(ts == Map(1L -> 100L, 2L -> 150L, 3L -> 500L, 4L -> 50L))
  }

  test("shared column names fail loudly at every entry point") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "b")).toDF("rk", "rt", "v") // "v" collides
    // before this guard, joinWithTolerance identified right columns BY
    // NAME and a shared name made the stale null-out hit LEFT columns
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("disjoint column names") &&
      e.getMessage.contains("v"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      AsOf.joinWithTolerance(l, r, "k", "rk", "t", "rt", 100L)
    }
    assert(e2.getMessage.contains("disjoint"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      AsOf.joinForward(l, r, "k", "rk", "t", "rt")
    }
    assert(e3.getMessage.contains("disjoint"), e3.getMessage)
  }
}
