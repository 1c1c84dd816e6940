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

  /** Hilbert-curve distance of cell (x, y) on an n x n grid (n a power of
    * two) — the standard bit-level xy→d walk (quadrant digit + rotate).
    * Unlike Morton order, consecutive Hilbert cells are always GRID
    * NEIGHBORS, so curve segments that straddle power-of-4 block boundaries
    * never jump across the key space — tighter per-file key spans when file
    * boundaries don't align with block sizes.
    */
  def hilbertXY2D(n: Int, xIn: Int, yIn: Int): Int = {
    var x = xIn; var y = yIn; var d = 0
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the sub-curve orients correctly
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Hilbert distances for the 16 x 16 grid, indexed by x*16 + y — folded to
    * a literal once at plan build (256 entries), so the per-row cost is one
    * array lookup. 4 bits per dimension is file/bucket-level clustering
    * granularity (data skipping works on ranges — see class doc).
    */
  lazy val Hilbert16: IndexedSeq[Long] =
    for (x <- 0 until 16; y <- 0 until 16)
      yield hilbertXY2D(16, x, y).toLong

  /** Hilbert cell index of (a mod 16, b mod 16) via the [[Hilbert16]]
    * literal lookup table.
    */
  def hilbert4(a: Column, b: Column): Column =
    element_at(typedLit(Hilbert16),
      (pmod(a.cast("long"), lit(16L)) * 16L + pmod(b.cast("long"), lit(16L)))
        .cast("int") + 1)

  /** DuckDB VALUES rows (x, y, d) mirroring [[Hilbert16]] — join the key
    * frame against this to state the same lookup verbatim in the oracle.
    */
  lazy val duckHilbert16Values: String =
    (for (x <- 0 until 16; y <- 0 until 16)
      yield s"($x,$y,${hilbertXY2D(16, x, y)})").mkString(", ")
}
