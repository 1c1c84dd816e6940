package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic numeric aggregation helpers.
  *
  * The harness hash-compares query output against a DuckDB oracle, so every
  * aggregate must be bit-identical across engines. Floating-point SUM is
  * order-dependent (shuffles reorder partial aggregates), so double columns
  * are summed in exact decimal space and only then cast back to double:
  * decimal addition is associative, and decimal->double conversion is
  * correctly rounded in both JVM BigDecimal and DuckDB. This is also the
  * right call at 100 TB: partial (map-side) aggregation stays enabled and
  * results stop depending on partition count.
  */
object Exact {

  /** Exact, order-independent sum of a double column with `scale` fractional
    * digits of real precision, returned as double.
    */
  def sumD(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(24,$scale)")).cast("double")

  /** Exact mean: exact decimal sum over exact count, divided in double space
    * (one correctly-rounded IEEE division — identical in any engine).
    */
  def avgD(c: Column, scale: Int = 2): Column =
    sumD(c, scale) / count(c)

  /** Sum of a decimal product (e.g. price * (1 - discount)) rounded to
    * `outScale` then cast to double while still exact.
    */
  def sumProductD(product: Column, outScale: Int = 2): Column =
    round(sum(product), outScale).cast("double")
}
