package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional clustering: interleaving the
  * bits of two key columns gives a single sort key whose ranges are
  * simultaneously local in BOTH dimensions — the lakehouse layout trick that
  * lets ONE clustered write serve min/max file-skipping on two predicates
  * (a plain sort clusters only its leading column; the trailing column's
  * per-file spans stay as wide as the table). Pure integer arithmetic —
  * shifts, masks, adds — so the curve value is bit-identical in any engine
  * and the oracle can state it verbatim.
  *
  * 16 bits per dimension (inputs taken mod 2^16): 32-bit z-values, enough
  * for file/bucket-level clustering — data skipping works on RANGES, so
  * key-truncation only coarsens locality, never correctness.
  */
object ZOrder {
  val Bits = 16

  /** Morton-interleave the low 16 bits of a (even positions) and b (odd
    * positions): z = sum_i ((a>>i & 1) << 2i | (b>>i & 1) << (2i+1)).
    */
  def interleave16(a: Column, b: Column): Column = {
    val a16 = pmod(a.cast("long"), lit(1L << Bits))
    val b16 = pmod(b.cast("long"), lit(1L << Bits))
    (0 until Bits).map { i =>
      (shiftright(a16, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b16, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** DuckDB SQL mirror of [[interleave16]] over expressions a, b —
    * generated programmatically so the 32 unrolled terms stay in lockstep
    * with the Spark expression.
    */
  def duckInterleave16(a: String, b: String): String = {
    val a16 = s"(($a) % ${1L << Bits})"
    val b16 = s"(($b) % ${1L << Bits})"
    (0 until Bits).map { i =>
      s"((($a16 >> $i) & 1) * ${1L << (2 * i)} + (($b16 >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
  }
}
