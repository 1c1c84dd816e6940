package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-ops primitive behind every incremental
  * path in the engine: a new corpus version arrives, and what the pipeline
  * actually needs is the CHANGE SET (added / removed / changed / unchanged
  * by content), because the added+changed slice is what flows into
  * incremental dedup (q29-family), index ingest (q499/q501) and SCD2-style
  * merges — re-running any of them over the unchanged 99% is the full-
  * rescan defect at 100 TB.
  *
  * Scale shape: each side is one scan producing (id, fingerprint) — the
  * fingerprint pushes into the projection, so the scan reads only the id
  * and content columns — then ONE co-partitioned full-outer shuffle join
  * on the id classifies every key. No window, no driver state; the output
  * is corpus-linear and the usual consumer filters it to the (small)
  * non-unchanged slice before acting, which prunes at the parquet scan of
  * a status-partitioned materialization.
  */
object Snapshot {

  /** Classify every id across two snapshot frames that already carry a
    * content fingerprint column `fpCol`: `added` (only in `b`), `removed`
    * (only in `a`), `changed` (both, fingerprints distinct), `unchanged`.
    * Presence is tracked by explicit markers, NOT fingerprint nullability
    * (a null fingerprint — e.g. the content column itself was null — is a
    * legal value on a PRESENT row), and the change test is null-safe
    * (`NOT <=>`, i.e. IS DISTINCT FROM): null-vs-value reads `changed`,
    * null-vs-null `unchanged`.
    */
  def diff(a: DataFrame, b: DataFrame, idCol: String, fpCol: String): DataFrame = {
    val av = a.select(col(idCol), col(fpCol).as("__fp_a"), lit(true).as("__in_a"))
    val bv = b.select(col(idCol), col(fpCol).as("__fp_b"), lit(true).as("__in_b"))
    av.join(bv, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("removed"))
          .when(!(col("__fp_a") <=> col("__fp_b")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
