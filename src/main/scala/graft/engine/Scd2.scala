package graft.engine

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Slowly-changing-dimension Type-2 merge (SURVEY.md section 7 M5; reference
  * behavior: final_dim_load.py:94-180 for dim_host, :329-451 for dim_listing).
  *
  * Semantics re-expressed Spark-first, preserved from the reference:
  *  - change detection via md5 over the concatenation of the SCD columns with
  *    nulls coalesced to the string "NULL" and NO separator between columns
  *    (final_dim_load.py:115-123 — the documented collision quirk
  *    `("ab","c") == ("a","bc")` is preserved deliberately for parity);
  *  - one frozen run timestamp shared by every row the merge touches
  *    (final_dim_load.py:28-29);
  *  - open rows carry a far-future end sentinel (2099-12-31) and
  *    `is_valid = true`;
  *  - changed keys expire their current version (`end_dt = runTs`,
  *    `is_valid = false`) and gain a fresh version; brand-new keys gain their
  *    first version; surrogate keys continue from the existing maximum
  *    (the reference's `agg(max)` watermark, final_dim_load.py:103-104).
  *
  * Scale notes (100 TB design point): the merge is three shuffles on the
  * natural key (change-detect join, expire semi-join, keep anti-join) plus the
  * key assignment. The changed-key set is usually tiny relative to the
  * dimension, so AQE converts the semi/anti joins to broadcasts at runtime.
  * Key assignment is pluggable: pass `Keys.surrogateKeys` for the reference's
  * single-task window or `Keys.surrogateKeysScalable` (default) for the
  * range-partitioned two-phase form with identical output.
  */
object Scd2 {

  /** md5 fingerprint of the SCD columns, null-coalesced, unseparated —
    * byte-identical to final_dim_load.py:115-123.
    */
  def rowHash(scdCols: Seq[String]): org.apache.spark.sql.Column =
    md5(concat(scdCols.map(c => coalesce(col(c).cast("string"), lit("NULL"))): _*))

  /** Initial (bootstrap) load: every incoming row becomes version 1
    * (final_dim_load.py:171-177).
    */
  def bootstrap(
      incoming: DataFrame,
      naturalKey: String,
      skCol: String,
      runTs: String,
      sentinel: String = "2099-12-31 00:00:00",
      keying: (DataFrame, String, String, Long) => DataFrame =
        Keys.surrogateKeysScalable(_, _, _, _)): DataFrame =
    keying(incoming, naturalKey, skCol, 0L)
      .withColumn("start_dt", lit(runTs).cast(TimestampType))
      .withColumn("end_dt", lit(sentinel).cast(TimestampType))
      .withColumn("is_valid", lit(true))

  /** Audit timestamp column (reference: `ta_insert_dt` via current_timestamp
    * on every warehouse write, final_dim_load.py:157, :164, :177, :238).
    * Parameterized with the frozen run timestamp instead of wall clock so the
    * output stays deterministic and oracle-comparable.
    */
  def withAuditTs(df: DataFrame, runTs: String,
      colName: String = "ta_insert_dt"): DataFrame =
    df.withColumn(colName, lit(runTs).cast(TimestampType))

  /** Bootstrap-vs-incremental dispatch (final_dim_load.py:168-180): read the
    * existing dimension if its path exists, else first run -> bootstrap. The
    * reference catches the read's exception; here the filesystem is probed
    * first (Spark 4 logs every caught AnalysisException with a full caller
    * stacktrace, which makes the expected first-run miss look like a crash
    * in driver logs), with a Try fallback for paths that exist but fail to
    * read as a dimension (corrupt/foreign content -> treat as first run).
    */
  def loadOrBootstrap(
      spark: SparkSession,
      dimPath: String,
      incoming: DataFrame,
      naturalKey: String,
      scdCols: Seq[String],
      skCol: String,
      runTs: String,
      sentinel: String = "2099-12-31 00:00:00"): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dimPath)
    val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    val existing = if (exists) Try(spark.read.parquet(dimPath)) else Failure(new Exception)
    existing match {
      case Success(e) =>
        merge(e, incoming, naturalKey, scdCols, skCol, runTs, sentinel)
      case Failure(_) =>
        bootstrap(incoming, naturalKey, skCol, runTs, sentinel)
    }
  }

  /** Incremental SCD2 merge. `existing` must carry `skCol`, `start_dt`,
    * `end_dt`, `is_valid`, the natural key and the SCD columns; `incoming`
    * carries the natural key and the SCD columns. Returns the full new
    * dimension state (history preserved) with `existing`'s column order.
    */
  def merge(
      existing: DataFrame,
      incoming: DataFrame,
      naturalKey: String,
      scdCols: Seq[String],
      skCol: String,
      runTs: String,
      sentinel: String = "2099-12-31 00:00:00",
      keying: (DataFrame, String, String, Long) => DataFrame =
        Keys.surrogateKeysScalable(_, _, _, _)): DataFrame = {

    val curr = existing.filter(col("is_valid"))

    // Driver-side watermark, exactly the reference's agg(max).collect()
    // round-trip (final_dim_load.py:103-104). One scalar — not a collect loop.
    val maxRow = existing.agg(max(col(skCol)).cast("long")).head
    val maxSk = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)

    val currHashed = curr
      .select(col(naturalKey), rowHash(scdCols).as("__curr_hash"))
    val changed = incoming
      .withColumn("__hash", rowHash(scdCols))
      .join(currHashed, Seq(naturalKey))
      .filter(col("__hash") =!= col("__curr_hash"))
      .drop("__hash", "__curr_hash")
    val brandNew = incoming
      .join(curr.select(naturalKey), Seq(naturalKey), "left_anti")

    // Changed keys drive both the expire and the keep branches; at scale the
    // set is small, so AQE broadcasts these joins.
    val changedKeys = changed.select(naturalKey).distinct()

    val expired = curr
      .join(changedKeys, Seq(naturalKey), "left_semi")
      .withColumn("end_dt", lit(runTs).cast(TimestampType))
      .withColumn("is_valid", lit(false))
    val keptCurrent = curr.join(changedKeys, Seq(naturalKey), "left_anti")
    val history = existing.filter(!col("is_valid"))

    // One deterministic keying pass over (new versions ∪ brand-new keys),
    // ordered by the natural key, continuing from the watermark. The
    // reference chains two windows with a count() round-trip in between
    // (final_dim_load.py:153+160); a single ordered window over the union is
    // the same dense, collision-free id space without the extra job.
    val fresh = keying(changed.unionByName(brandNew), naturalKey, skCol, maxSk)
      .withColumn("start_dt", lit(runTs).cast(TimestampType))
      .withColumn("end_dt", lit(sentinel).cast(TimestampType))
      .withColumn("is_valid", lit(true))

    val cols = existing.columns.map(col).toSeq
    history.select(cols: _*)
      .unionByName(keptCurrent.select(cols: _*))
      .unionByName(expired.select(cols: _*))
      .unionByName(fresh.select(cols: _*))
  }

  /** Full-snapshot SCD2 merge: `incoming` is the COMPLETE current key
    * universe, so a currently-valid key ABSENT from it is a logical delete —
    * its current version is expired at runTs with no successor. Everything
    * else behaves exactly like [[merge]]. (The incremental merge cannot
    * detect deletes: a changes-only feed can't distinguish "unchanged"
    * from "gone".) The missing-key set is small relative to the dimension,
    * so AQE broadcasts the marker join.
    */
  def mergeFullSnapshot(
      existing: DataFrame,
      incoming: DataFrame,
      naturalKey: String,
      scdCols: Seq[String],
      skCol: String,
      runTs: String,
      sentinel: String = "2099-12-31 00:00:00",
      keying: (DataFrame, String, String, Long) => DataFrame =
        Keys.surrogateKeysScalable(_, _, _, _)): DataFrame = {
    val merged = merge(existing, incoming, naturalKey, scdCols, skCol, runTs,
      sentinel, keying)
    val missing = existing.filter(col("is_valid")).select(col(naturalKey))
      .join(incoming.select(col(naturalKey)).distinct(), Seq(naturalKey), "left_anti")
      .distinct()
      .withColumn("__gone", lit(true))
    merged.join(missing, Seq(naturalKey), "left")
      // end_dt first (guarded by the still-unmodified is_valid), then the
      // validity flip — history rows of a gone key keep their end_dt.
      .withColumn("end_dt",
        when(col("__gone").isNotNull && col("is_valid"),
          lit(runTs).cast(TimestampType)).otherwise(col("end_dt")))
      .withColumn("is_valid",
        when(col("__gone").isNotNull, lit(false)).otherwise(col("is_valid")))
      .drop("__gone")
      .select(existing.columns.map(col).toSeq: _*)
  }
}
