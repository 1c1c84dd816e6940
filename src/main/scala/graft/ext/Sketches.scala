package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed count-min sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J. Algorithms
  * 55(1), 2005) with DETERMINISTIC row hashes, so sketch contents are
  * engine-reproducible (the usual CMS seeds randomly; here row j hashes with
  * the shared 60-bit md5 hash under a "cmsj:" prefix).
  *
  * Scale shape: building the sketch is one hash aggregate over
  * (row, bucket) — depth x width cells total regardless of input size, so
  * the cell table always broadcasts. Point estimates (min over depth cells)
  * then cost a broadcast join per probe, never a shuffle of the corpus. The
  * estimate upper-bounds the true count (one-sided error <= 2N/width with
  * probability 1 - (1/2)^depth).
  */
object Sketches {

  private def bucket(v: Column, j: Int, width: Int): Column =
    pmod(TextHash.hash60(concat(lit(s"cms$j:"), v.cast("string"))), lit(width.toLong))

  /** CMS cell counts (j, bucket, cnt) over `items(valueCol)` — the sketch
    * itself, depth x width rows.
    */
  def cmsCells(items: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2)
    items
      .select(explode(array((0 until depth).map { j =>
        struct(lit(j).as("j"), bucket(col(valueCol), j, width).as("bucket"))
      }: _*)).as("__jb"))
      .select(col("__jb.j").as("j"), col("__jb.bucket").as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes(valueCol)`: min over the depth cells each
    * probe hashes into. `cells` is the [[cmsCells]] output (tiny —
    * broadcast). LEFT join + coalesce(0): a cell with no row is a ZERO
    * cell, and the CMS upper-bound contract requires it to participate in
    * the min (a never-inserted probe must estimate 0, not vanish or
    * overestimate from its populated cells only).
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame =
    probes
      .select(col(valueCol), explode(array((0 until depth).map { j =>
        struct(lit(j).as("j"), bucket(col(valueCol), j, width).as("bucket"))
      }: _*)).as("__jb"))
      .select(col(valueCol), col("__jb.j").as("j"), col("__jb.bucket").as("bucket"))
      .join(broadcast(cells), Seq("j", "bucket"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
