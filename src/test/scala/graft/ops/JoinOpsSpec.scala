package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join semantics on a hand-computed fixture. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest prior right row per key; same-instant matches; none → NULL") {
    val clicks = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")), // after views 10 and 11
      (101L, 1L, ts("2024-01-01 08:30:00")), // same instant as view 10
      (102L, 1L, ts("2024-01-01 08:00:00")), // before any view
      (103L, 2L, ts("2024-01-01 12:00:00"))  // user with no views
    ).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (10L, 1L, ts("2024-01-01 08:30:00")),
      (11L, 1L, ts("2024-01-01 09:15:00"))
    ).toDF("view_id", "user_id", "ts")
    val got = JoinOps.asOfJoin(clicks, views, "user_id",
        "ts", "ts", "event_id", "view_id", "view_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Long]("asof_view_id"))).toMap
    assert(got(100L).contains(11L)) // latest of the two prior views
    assert(got(101L).contains(10L)) // same-instant view is visible
    assert(got(102L).isEmpty)       // nothing prior → NULL
    assert(got(103L).isEmpty)       // key with no right rows → NULL
  }

  test("asOfJoinForward: earliest at-or-after right row; none ahead → NULL") {
    val clicks = Seq(
      (100L, 1L, ts("2024-01-01 08:00:00")), // before both views → nearest is 10
      (101L, 1L, ts("2024-01-01 08:30:00")), // same instant as view 10
      (102L, 1L, ts("2024-01-01 10:00:00")), // after all views → NULL
      (103L, 2L, ts("2024-01-01 12:00:00"))  // user with no views
    ).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (10L, 1L, ts("2024-01-01 08:30:00")),
      (11L, 1L, ts("2024-01-01 09:15:00"))
    ).toDF("view_id", "user_id", "ts")
    val got = JoinOps.asOfJoinForward(clicks, views, "user_id",
        "ts", "ts", "event_id", "view_id", "view_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Long]("next_view_id"))).toMap
    assert(got(100L).contains(10L)) // nearest FUTURE view, not the latest
    assert(got(101L).contains(10L)) // same-instant view is visible
    assert(got(102L).isEmpty)       // nothing ahead → NULL
    assert(got(103L).isEmpty)       // key with no right rows → NULL
  }

  test("asOfJoinTolerance: stale matches NULL out at the bound, fresh ones keep") {
    val clicks = Seq(
      (100L, 1L, ts("2024-01-03 08:00:00")), // view 10 is 2 days stale → NULL
      (101L, 1L, ts("2024-01-01 09:00:00")), // view 10 is 1 h old → match
      (102L, 1L, ts("2024-01-02 08:00:00")), // exactly 24 h → inclusive bound keeps
      (103L, 2L, ts("2024-01-01 12:00:00"))  // no views at all → NULL
    ).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (10L, 1L, ts("2024-01-01 08:00:00"))
    ).toDF("view_id", "user_id", "ts")
    val got = JoinOps.asOfJoinTolerance(clicks, views, "user_id",
        "ts", "ts", "event_id", "view_id", "view_id", tolSeconds = 86400L)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Long]("asof_view_id"))).toMap
    assert(got(100L).isEmpty, "match older than the tolerance must NULL out")
    assert(got(101L).contains(10L))
    assert(got(102L).contains(10L), "the bound is inclusive")
    assert(got(103L).isEmpty)
  }
}
