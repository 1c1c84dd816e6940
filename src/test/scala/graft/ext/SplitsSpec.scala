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
