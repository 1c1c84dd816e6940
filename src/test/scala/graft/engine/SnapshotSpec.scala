package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit coverage for the snapshot-diff classifier — the four statuses on a
  * hand-built pair of versions, plus the degenerate edges (empty side).
  * Corpus-scale values are hash-gated by q510's DuckDB oracle.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), md5(col("content")).as("fp"))

  test("diff classifies added, removed, changed and unchanged") {
    val a = fp(Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "content"))
    val b = fp(Seq((1L, "same"), (2L, "new"), (4L, "fresh")).toDF("id", "content"))
    val got = Snapshot.diff(a, b, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("diff is null-safe: null fingerprints mark presence, not absence") {
    // a present row with a NULL fingerprint (null content) must classify by
    // presence + IS-DISTINCT-FROM, never read as a missing side
    val a = Seq((1L, Some("x")), (2L, None), (3L, None))
      .toDF("id", "fp").select(col("id"), col("fp").as("fp"))
    val b = Seq((1L, None: Option[String]), (2L, None), (3L, Some("y")))
      .toDF("id", "fp")
    val got = Snapshot.diff(a, b, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "changed",   // value -> null is a content change
      2L -> "unchanged", // null on both sides is not
      3L -> "changed"))  // null -> value is a content change
  }

  test("diff against an empty side degrades to all-added / all-removed") {
    val a = fp(Seq((1L, "x"), (2L, "y")).toDF("id", "content"))
    val empty = fp(Seq.empty[(Long, String)].toDF("id", "content"))
    assert(Snapshot.diff(empty, a, "id", "fp")
      .collect().map(_.getString(1)).toSet === Set("added"))
    assert(Snapshot.diff(a, empty, "id", "fp")
      .collect().map(_.getString(1)).toSet === Set("removed"))
  }
}
