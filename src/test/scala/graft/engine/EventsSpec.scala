package graft.engine

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("sessionizeTyped emits exactly the window-form sessions") {
    val ev = Tables.events(spark, sf0001)
    val window = Events.sessionize(ev, gapSeconds = 1800L)
      .select("user_id", "session_seq", "session_start", "session_end", "n_events")
    val typed = Events.sessionizeTyped(ev, gapSeconds = 1800L).toDF()
    assert(window.except(typed).count() === 0)
    assert(typed.except(window).count() === 0)
    assert(typed.count() === window.count())
  }

  test("sessionizeTyped splits on the idle gap boundary (strictly greater)") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def plus(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000)
    val ev = Seq(
      (1L, ts0, 7L, "click", 1.0),
      (2L, plus(1800L), 7L, "click", 1.0),  // exactly the gap -> same session
      (3L, plus(3601L), 7L, "click", 1.0))  // 1801s later -> new session
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionizeTyped(ev, gapSeconds = 1800L)
      .collect().sortBy(_.session_seq)
    assert(out.length === 2)
    assert(out(0).n_events === 2 && out(1).n_events === 1)
  }
}
