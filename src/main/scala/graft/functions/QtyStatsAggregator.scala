package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` over integral quantities: (count, long sum) buffer →
  * (n, sum, mean). Like [[QuantizedCentroidAggregator]] (its vector
  * companion), the buffer is pure INTEGER arithmetic —
  * associative and commutative bit-exactly — so the typed
  * `KeyValueGroupedDataset.agg` path can go through the DuckDB oracle gate:
  * any partitioning/merge order produces the identical result, and the one
  * double division happens once at finish. The buffer is two longs per
  * group per partition — the same map-side partial-agg contract a built-in
  * DeclarativeAggregate has.
  */
class QtyStatsAggregator extends Aggregator[Long, (Long, Long), (Long, Long, Double)] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), v: Long): (Long, Long) = (b._1 + 1L, b._2 + v)

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): (Long, Long, Double) =
    (r._1, r._2, if (r._1 == 0) 0.0 else r._2.toDouble / r._1)

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[(Long, Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
}
