package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** As-of join (most recent right row at or before each left row's time):
  * value truth vs a brute-force per-row computation, tie-break determinism,
  * tolerance, inner mode, null handling, and the plan shape that makes it
  * scale — one union + one window, never a join (no L*R explosion). */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  // left: (key, time, lid); right: (key, time, rid, value)
  private lazy val left = Seq(
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 5L, 3L), // 5 precedes every right row
    ("b", 100L, 4L), ("c", 50L, 5L), // c has no right rows at all
    ("a", 15L, 6L)
  ).toDF("k", "lt", "lid")
  private lazy val right = Seq(
    ("a", 10L, 10L, 1.0), ("a", 10L, 11L, 2.0), // tie at t=10: rid 11 wins
    ("a", 12L, 12L, 3.0), ("b", 40L, 13L, 4.0), ("b", 90L, 14L, 5.0)
  ).toDF("k", "rt", "rid", "v")

  private def truth(lk: String, lt: Long): Option[(Long, Double)] = {
    val cands = Seq(("a", 10L, 10L, 1.0), ("a", 10L, 11L, 2.0), ("a", 12L, 12L, 3.0),
      ("b", 40L, 13L, 4.0), ("b", 90L, 14L, 5.0))
      .filter { case (k, t, _, _) => k == lk && t <= lt }
    if (cands.isEmpty) None
    else Some {
      val best = cands.maxBy { case (_, t, rid, _) => (t, rid) } // greatest tie-break wins
      (best._3, best._4)
    }
  }

  test("matches the brute-force point-in-time truth, with deterministic ties") {
    val got = AsOfJoin.asof(left, right, "lt", "rt", Seq("k"), rightTieBreak = Some("rid"))
      .select("k", "lt", "lid", "rt", "rid", "v").collect()
    assert(got.length == left.count())
    for (r <- got) {
      val exp = truth(r.getString(0), r.getLong(1))
      exp match {
        case Some((rid, v)) =>
          assert(!r.isNullAt(4) && r.getLong(4) == rid && r.getDouble(5) == v,
            s"row $r expected match ($rid, $v)")
        case None =>
          assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5), s"row $r expected no match")
      }
    }
  }

  test("tolerance discards stale matches but keeps the left row (outer)") {
    // b@100 matches b@90 (age 10); tolerance 5 must null it out, not drop it
    val got = AsOfJoin.asof(left, right, "lt", "rt", Seq("k"),
      rightTieBreak = Some("rid"), tolerance = 5L)
      .filter($"lid" === 4L).select("rt", "rid").collect()
    assert(got.length == 1 && got(0).isNullAt(0) && got(0).isNullAt(1))
    // age exactly == tolerance still matches (inclusive bound)
    val ok = AsOfJoin.asof(left, right, "lt", "rt", Seq("k"),
      rightTieBreak = Some("rid"), tolerance = 10L)
      .filter($"lid" === 4L).select("rid").collect()
    assert(ok.length == 1 && ok(0).getLong(0) == 14L)
  }

  test("inner mode drops unmatched left rows") {
    val got = AsOfJoin.asof(left, right, "lt", "rt", Seq("k"),
      rightTieBreak = Some("rid"), inner = true).select("lid").collect().map(_.getLong(0)).sorted
    // lid 3 (t=5 before all rights) and lid 5 (key c) drop
    assert(got.sameElements(Array(1L, 2L, 4L, 6L)))
  }

  test("null times: null-time right rows never match; null-time left rows keep nulls") {
    val l = Seq(("a", Some(10L), 1L), ("a", None, 2L)).toDF("k", "lt", "lid")
    val r = Seq(("a", Some(5L), 10L), ("a", None, 11L)).toDF("k", "rt", "rid")
    val got = AsOfJoin.asof(l, r, "lt", "rt", Seq("k"), rightTieBreak = Some("rid"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(got(1L) == 10L, "real-time right row matches")
    assert(got(2L) == -1L, "null-time left row matches nothing")
  }

  test("plan is union + single window — no join node, one shuffle") {
    val q = AsOfJoin.asof(left, right, "lt", "rt", Seq("k"), rightTieBreak = Some("rid"))
    q.collect() // finalize AQE
    // AQE prints Final + Initial sections; grade only the final plan
    val plan = q.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a window:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected at most one shuffle (union then window):\n$plan")
  }

  test("column collisions and missing tie-break are rejected loudly") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right.withColumnRenamed("rt", "lt"), "lt", "lt", Seq("k"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, "lt", "rt", Seq("k"), rightTieBreak = Some("nope"))
    }
  }

  test("events fixture: clicks attribute to the most recent prior purchase") {
    val got = SparkEntry.queries("x23_asof_join")(spark, sf())
    val rows = got.collect()
    val ev = Tables.parquet(spark, sf(), "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").collect()
    val purchases = ev.filter(_.getString(3) == "purchase")
    val tsOf = ev.map(e => e.getLong(0) -> e.getLong(1)).toMap
    var matched = 0
    for (r <- rows) { // columns: click_id, user_id, purchase_id, purchase_value
      val (clickTs, user) = (tsOf(r.getLong(0)), r.getLong(1))
      val cands = purchases.filter(p => p.getLong(2) == user && p.getLong(1) <= clickTs)
      if (cands.isEmpty) assert(r.isNullAt(2))
      else {
        val best = cands.maxBy(p => (p.getLong(1), p.getLong(0)))
        assert(r.getLong(2) == best.getLong(0), s"click ${r.getLong(0)}")
        matched += 1
      }
    }
    assert(matched > 0, "fixture should produce at least one attribution")
  }
}
