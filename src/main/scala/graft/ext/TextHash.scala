package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine deterministic hashing for the text-dedup extensions.
  *
  * MinHash/SimHash need a hash function that the DuckDB oracle can reproduce
  * bit-for-bit. Spark's `hash()`/`xxhash64()` are Murmur3/xxHash with Spark's
  * own seeding — not portable. md5 is standard everywhere, so the shared
  * primitive is "first 15 hex digits of md5, parsed as a 60-bit integer":
  *   Spark : conv(substring(md5(s), 1, 15), 16, 10)::long
  *   DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
  * 15 hex digits = 60 bits, which fits a signed 64-bit long without overflow
  * in either engine. At 100 TB scale this is pure map-side CPU — no shuffle,
  * embarrassingly parallel — and a faster non-portable hash (xxhash64) can be
  * swapped in behind the same API once oracle parity is no longer needed.
  */
object TextHash {

  /** 60-bit deterministic hash of a string column (non-negative). Resolves
    * to the codegen'd native expression (graft.functions.Hash60) — register
    * via GraftFunctions.ensureRegistered or the GraftExtensions session
    * extension. Numerically identical to [[hash60Portable]].
    */
  def hash60(c: Column): Column = call_function("graft_hash60", c)

  /** Built-ins-only composition of the same hash (≈40 us/value interpreted —
    * kept as the cross-check reference for the native expression).
    */
  def hash60Portable(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB SQL fragment equivalent of [[hash60]], for oracle construction. */
  def duckHash60(sqlExpr: String): String =
    s"CAST(('0x' || substr(md5($sqlExpr), 1, 15)) AS BIGINT)"
}
