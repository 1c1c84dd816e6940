package graft.ext

import org.apache.spark.sql.functions._

/** Pins the pinned-split policy's four arms (Splits.pinnedComponentSplits)
  * on a synthetic two-version fixture — including the MERGE-CONFLICT
  * quarantine arm, which real test corpora rarely populate (merges need a
  * bridging change between two previously-pinned components), so the gate
  * (q515) alone would leave it unexercised.
  */
class SplitsSpec extends graft.SparkSpec {

  private val W = Seq("train" -> 80, "val" -> 10, "test" -> 10)

  test("pinned splits: survivors never flip, new docs inherit, all-new hash, merges quarantine") {
    import spark.implicits._
    // prior version: component {1,2} was 'train', {3,4} 'test', 5 'val'
    val prior = Seq((1L, "train"), (2L, "train"), (3L, "test"), (4L, "test"),
      (5L, "val")).toDF("doc_id", "prior_split")
    // current version: doc 10 bridges the two pinned components (CONFLICT);
    // doc 11 joins 5's component (clean inheritance); {20,21} is all-new
    val members = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 1L),
      (5L, 5L), (11L, 5L), (20L, 20L), (21L, 20L)).toDF("doc_id", "component")
    val out = Splits.pinnedComponentSplits(members, "doc_id", "component",
        prior, "prior_split", W)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split"), r.getAs[Int]("quarantined"))).toMap
    // arm 1: survivors keep their prior splits — even inside the conflict
    assert(out(1L) === ("train", 1) && out(2L) === ("train", 1))
    assert(out(3L) === ("test", 1) && out(4L) === ("test", 1))
    // arm 4: the merged component quarantines every member; the bridging
    // doc inherits the lowest-id survivor's split (doc 1 -> 'train')
    assert(out(10L) === ("train", 1))
    // arm 2: clean single-pin inheritance, no quarantine
    assert(out(5L) === ("val", 0) && out(11L) === ("val", 0))
    // arm 3: the all-new component uses the stateless hash rule — exactly
    // what splitAssign gives the same component id — with no quarantine
    val hashRule = Seq(20L).toDF("component")
      .select(TextAnalysis.splitAssign(col("component"), W).as("s"))
      .head().getString(0)
    assert(out(20L) === (hashRule, 0) && out(21L) === (hashRule, 0))
  }

  test("versioned splits: conflict flags and resets, dissolution cools, the calm window retires") {
    import spark.implicits._
    def step(members: org.apache.spark.sql.DataFrame,
        prior: org.apache.spark.sql.DataFrame) =
      Splits.pinnedComponentSplitsVersioned(members, "doc_id", "component",
          prior, "split", "quarantined", "stable_for", W, retireAfter = 2)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("split"), r.getAs[Int]("quarantined"),
            r.getAs[Int]("stable_for")))).toMap
    // v1: docs 1 ('train') and 2 ('test') are separate pinned singletons
    val st1 = Seq((1L, "train", 0, 0), (2L, "test", 0, 0))
      .toDF("doc_id", "split", "quarantined", "stable_for")
    // v2: a bridge merges them — LIVE CONFLICT: flagged, clock at 0,
    // splits kept (never flipped)
    val m2 = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "component")
    val out2 = step(m2, st1)
    assert(out2 === Map(1L -> ("train", 1, 0), 2L -> ("test", 1, 0)))
    // v3: doc 2 leaves — the conflict DISSOLVES, but re-entry waits out
    // the calm window (retireAfter=2): still flagged, clock at 1
    val m3 = Seq((1L, 1L)).toDF("doc_id", "component")
    val st2 = Seq((1L, "train", 1, 0), (2L, "test", 1, 0))
      .toDF("doc_id", "split", "quarantined", "stable_for")
    val out3 = step(m3, st2)
    assert(out3 === Map(1L -> ("train", 1, 1)))
    // v4: a second calm version RETIRES the component — flag cleared, the
    // survivor re-enters eval with the split it always had
    val st3 = Seq((1L, "train", 1, 1)).toDF("doc_id", "split", "quarantined", "stable_for")
    assert(step(m3, st3) === Map(1L -> ("train", 0, 2)))
    // v5: post-retirement state is plain — no flag, clock back at 0
    val st4 = Seq((1L, "train", 0, 2)).toDF("doc_id", "split", "quarantined", "stable_for")
    assert(step(m3, st4) === Map(1L -> ("train", 0, 0)))
    // re-conflict after retirement resets the lifecycle from the top
    val m5 = Seq((1L, 1L), (9L, 1L)).toDF("doc_id", "component")
    val st4b = Seq((1L, "train", 0, 0), (9L, "test", 0, 0))
      .toDF("doc_id", "split", "quarantined", "stable_for")
    assert(step(m5, st4b) === Map(1L -> ("train", 1, 0), 9L -> ("test", 1, 0)))
  }

  test("versioned splits: clean components and all-new components never enter the lifecycle") {
    import spark.implicits._
    val prior = Seq((1L, "val", 0, 0)).toDF("doc_id", "split", "quarantined", "stable_for")
    // doc 2 inherits 1's pin; {20,21} is all-new and takes the hash rule
    val members = Seq((1L, 1L), (2L, 1L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "component")
    val out = Splits.pinnedComponentSplitsVersioned(members, "doc_id",
        "component", prior, "split", "quarantined", "stable_for", W,
        retireAfter = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("split"), r.getAs[Int]("quarantined"),
          r.getAs[Int]("stable_for")))).toMap
    val hashRule = Seq(20L).toDF("component")
      .select(TextAnalysis.splitAssign(col("component"), W).as("s"))
      .head().getString(0)
    assert(out(1L) === ("val", 0, 0) && out(2L) === ("val", 0, 0))
    assert(out(20L) === ((hashRule, 0, 0)) && out(21L) === ((hashRule, 0, 0)))
  }

  test("pinned splits: a version with no changes reproduces the prior assignment verbatim") {
    import spark.implicits._
    val prior = Seq((1L, "train"), (2L, "val"), (3L, "test"))
      .toDF("doc_id", "prior_split")
    val members = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "component")
    val out = Splits.pinnedComponentSplits(members, "doc_id", "component",
        prior, "prior_split", W)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split"), r.getAs[Int]("quarantined"))).toMap
    assert(out === Map(1L -> ("train", 0), 2L -> ("val", 0), 3L -> ("test", 0)))
  }
}
