package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // left: (id, ts, key); right: (id, ts, key, v)
  private lazy val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), "a"),
    (2L, ts("2024-01-01 12:00:00"), "a"),
    (3L, ts("2024-01-01 09:00:00"), "b"), // before any right row of b
    (4L, ts("2024-01-01 11:00:00"), "c")  // key with no right rows at all
  ).toDF("id", "t", "k")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 09:30:00"), "a", 1.0),
    (11L, ts("2024-01-01 12:00:00"), "a", 2.0), // equal-time: inclusive match
    (12L, ts("2024-01-01 10:00:00"), "b", 3.0)
  ).toDF("id", "t", "k", "v")

  private lazy val joined = AsOfJoin.asofBackward(
    left, right.select(col("id"), col("t"), col("k"),
      col("v").as("rv"), col("id").as("rid")),
    key = "k", leftTime = "t", rightTime = "t", tieBreak = "id",
    rightVals = Seq("rv", "rid"))
    .orderBy("id")

  test("backward-inclusive semantics: latest right row at-or-before each left row") {
    val rows = joined.select("id", "rv", "rid").collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(rows(0) === ((1L, Some(1.0), Some(10L))))  // 10:00 sees 09:30
    assert(rows(1) === ((2L, Some(2.0), Some(11L))))  // 12:00 sees equal-time 12:00
  }

  test("left rows with no preceding right row keep nulls (left-join shape)") {
    val rows = joined.select("id", "rv").collect().map(r =>
      (r.getLong(0), Option(r.get(1))))
    assert(rows(2) === ((3L, None)))
    assert(rows(3) === ((4L, None)))
    assert(joined.count() === left.count()) // exactly one output row per left row
  }

  test("same-timestamp right duplicates resolve by the tiebreak, deterministically") {
    val dupRight = Seq(
      (20L, ts("2024-01-01 09:00:00"), "a", 5.0),
      (21L, ts("2024-01-01 09:00:00"), "a", 6.0)
    ).toDF("id", "t", "k", "v")
    val out = AsOfJoin.asofBackward(
      left.filter(col("id") === 1L),
      dupRight.select(col("id"), col("t"), col("k"),
        col("v").as("rv"), col("id").as("rid")),
      key = "k", leftTime = "t", rightTime = "t", tieBreak = "id",
      rightVals = Seq("rv", "rid"))
    val r = out.select("rid", "rv").head
    assert(r.getLong(0) === 21L && r.getDouble(1) === 6.0) // greatest tiebreak wins
  }

  test("tolerance bound: stale matches null out, boundary is inclusive") {
    def within(maxUs: Long) = AsOfJoin.asofBackwardWithin(
      left, right.select(col("id"), col("t"), col("k"),
        col("v").as("rv"), col("id").as("rid")),
      key = "k", leftTime = "t", rightTime = "t", tieBreak = "id",
      rightVals = Seq("rv", "rid"), maxStalenessUs = maxUs,
      matchedTimeCol = "mt")
      .orderBy("id")
      .select("id", "rv", "mt").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

    // 30 min tolerance: id=1's 09:30 match is EXACTLY 30 min old — kept
    val at30 = within(30L * 60 * 1000000)
    assert(at30(0)._2 === Some(1.0) && at30(0)._3.isDefined)
    assert(at30(1)._2 === Some(2.0)) // equal-time match, staleness 0
    assert(at30(2)._2 === None && at30(3)._2 === None) // no-match rows stay null

    // 29 min tolerance: id=1's match is now stale — nulls out, id=2 keeps
    val at29 = within(29L * 60 * 1000000)
    assert(at29(0)._2 === None && at29(0)._3 === None)
    assert(at29(1)._2 === Some(2.0))
  }
}
