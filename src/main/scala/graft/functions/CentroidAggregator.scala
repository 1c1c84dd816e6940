package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the element-wise mean of float vectors — the
  * IVF "centroid" building block (assign cells upstream, refine centroids
  * here, iterate). Demonstrates the custom-UDAF surface (SURVEY.md section
  * 2.11: reserved for extensions): a mergeable buffer (per-dim fixed-point
  * sums + count) that partial-aggregates map-side and merges associatively,
  * so the shuffle carries one buffer per group per partition — the same
  * contract a built-in DeclarativeAggregate has.
  *
  * Per-dim sums are fixed-point longs — floor(v * 2^scaleBits), the same
  * power-of-TWO micro-unit convention as the engine's exact decimal moments
  * (a power of ten would hit Spark-vs-DuckDB half-way rounding splits;
  * floor of an exactly-computed double is unambiguous in both engines:
  * float->double is exact and so is multiplying by 2^24). Integer addition
  * is associative and commutative, so ANY partition count / merge order
  * yields bit-identical buffers, and the single double division at finish
  * makes the output hash-comparable across engines (value-gated by q399).
  * An earlier double-sum twin of this class was retired in round 6: its
  * last-ulp depended on merge order, which made it spec-only-testable and
  * invited accidental use over the gated path. Quantization bias is at most
  * 2^-scaleBits per element (floor truncation), deterministic by
  * construction.
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
