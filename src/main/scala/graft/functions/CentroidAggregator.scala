package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the element-wise mean of float vectors — the
  * IVF "centroid" building block (assign cells upstream, refine centroids
  * here, iterate). Demonstrates the custom-UDAF surface (SURVEY.md section
  * 2.11: reserved for extensions): a mergeable buffer (per-dim double sums +
  * count) that partial-aggregates map-side and merges associatively, so the
  * shuffle carries one buffer per group per partition — the same contract a
  * built-in DeclarativeAggregate has.
  *
  * Double accumulation is order-dependent in the last ulps (merge order
  * varies with partitioning), so this is spec-verified against the exact
  * decimal-sum expression formulation (q35_centroids) within tolerance —
  * the expression path is the oracle-exact one; this is the programmatic
  * `KeyValueGroupedDataset.agg` path.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    val it = v.iterator
    while (i < dim && it.hasNext) { sums(i) += it.next().toDouble; i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.fill(dim)(0.0)
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Merge-order-FREE variant of [[CentroidAggregator]]: per-dim sums are held
  * as fixed-point longs — floor(v * 2^scaleBits), the same power-of-TWO
  * micro-unit convention as the engine's exact decimal moments (a power of
  * ten would hit Spark-vs-DuckDB half-way rounding splits; floor of an
  * exactly-computed double is unambiguous in both engines: float->double is
  * exact and so is multiplying by 2^24). Integer addition is associative and
  * commutative, so ANY partition count / merge order yields bit-identical
  * buffers, and the single double division at finish makes the output
  * hash-comparable across engines — the property the plain double-sum
  * aggregator can't offer (its last-ulp depends on merge order). Quantization
  * bias is at most 2^-scaleBits per element (floor truncation), deterministic
  * by construction.
  *
  * finish mirrors the oracle expression exactly:
  * (CAST(sum AS DOUBLE) / n) / 2^scaleBits.
  */
class QuantizedCentroidAggregator(dim: Int, scaleBits: Int = 24)
    extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Double]] {
  require(scaleBits > 0 && scaleBits < 63, s"scaleBits=$scaleBits out of range")
  private val scale: Double = (1L << scaleBits).toDouble

  override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)

  override def reduce(b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
    val (sums, n) = b
    var i = 0
    val it = v.iterator
    while (i < dim && it.hasNext) {
      sums(i) += math.floor(it.next().toDouble * scale).toLong
      i += 1
    }
    (sums, n + 1)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Long], Long)): Seq[Double] =
    if (r._2 == 0) Seq.fill(dim)(0.0)
    else r._1.map(s => s.toDouble / r._2 / scale).toSeq

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Long]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
