package graft.engine

import org.apache.spark.sql.DataFrame

/** C1/C2 cache lifecycle (reference: the three dims are cached before the
  * 4-stage fact join and unpersisted after both the parquet and warehouse
  * writes consumed them — final_fact_load.py:20-22, :163-165).
  *
  * Exposed as a scoped helper so the unpersist can never be forgotten: cache
  * the frames, run the multi-action body, release. Benchmarked single-action
  * queries deliberately do NOT cache (materializing a cache for one
  * consumption is pure overhead — BASELINE.md's no-triple-evaluation rule).
  */
object Caching {

  def withCached[A](dfs: Seq[DataFrame])(body: => A): A = {
    dfs.foreach(_.cache())
    try body
    finally dfs.foreach(_.unpersist())
  }
}
