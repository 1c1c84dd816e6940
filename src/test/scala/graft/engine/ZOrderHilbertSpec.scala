package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the space-filling-curve layout helpers (q408/q413):
  * the Hilbert table is a bijective walk whose consecutive cells are grid
  * neighbors (the locality claim the q413 audit rests on), the column
  * expression agrees with the driver-side function, and on non-aligned
  * curve segments Hilbert's worst per-segment span never exceeds Morton's.
  */
class ZOrderHilbertSpec extends SparkSpec {

  private val cells =
    for (x <- 0 until 16; y <- 0 until 16) yield (x, y, ZOrder.hilbertXY2D(16, x, y))

  test("hilbertXY2D is a bijection onto 0..255") {
    assert(cells.map(_._3).sorted == (0 until 256))
  }

  test("consecutive Hilbert cells are grid neighbors (|dx|+|dy| = 1)") {
    val byD = cells.map { case (x, y, d) => d -> (x, y) }.toMap
    (0 until 255).foreach { d =>
      val (x0, y0) = byD(d); val (x1, y1) = byD(d + 1)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump between d=$d ($x0,$y0) and d=${d + 1} ($x1,$y1)")
    }
  }

  test("hilbert4 column matches the driver-side walk (incl. mod-16 wrap)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (15L, 15L), (7L, 9L), (16L, 17L), (1000L, 999L))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.hilbert4(col("a"), col("b")).as("h"))
      .collect()
    got.foreach { r =>
      val exp = ZOrder.hilbertXY2D(16, (r.getLong(0) % 16).toInt, (r.getLong(1) % 16).toInt)
      assert(r.getLong(2) == exp.toLong, s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("non-aligned 12-cell segments: Hilbert worst span <= Morton worst span") {
    def spans(key: (Int, Int) => Int): (Int, Int) = {
      val seg = (for (x <- 0 until 16; y <- 0 until 16)
        yield (key(x, y) / 12, x, y)).groupBy(_._1)
      val sa = seg.values.map(g => g.map(_._2).max - g.map(_._2).min).max
      val sb = seg.values.map(g => g.map(_._3).max - g.map(_._3).min).max
      (sa, sb)
    }
    def morton(x: Int, y: Int): Int =
      (0 until 4).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    val (ha, hb) = spans(ZOrder.hilbertXY2D(16, _, _))
    val (ma, mb) = spans(morton)
    assert(math.max(ha, hb) <= math.max(ma, mb),
      s"hilbert ($ha,$hb) vs morton ($ma,$mb)")
  }
}
