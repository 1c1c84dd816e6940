package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class CentroidAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("quantized aggregator is bit-identical across partitionings") {
    // The q399 gate's load-bearing property: fixed-point long buffers make
    // the merge associative+commutative, so wildly different partition
    // counts (different merge trees) must produce EXACTLY equal doubles —
    // no tolerance. (A plain double-sum buffer cannot pass this test, which
    // is why the former double-sum twin of this aggregator was retired: it
    // was only spec-testable within tolerance and invited accidental use
    // over the hash-gated path.)
    val e = Tables.embeddings(spark, sf0001)
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    def run(parts: Int): Map[Int, Seq[Double]] =
      e.repartition(parts)
        .select(col("label"), col("embedding").as("v"))
        .as[(Int, Seq[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(new QuantizedCentroidAggregator(dim).toColumn.name("centroid"))
        .collect().toMap
    val a = run(2)
    val b = run(29)
    assert(a.keySet === b.keySet)
    a.foreach { case (label, c) => assert(c === b(label), s"label $label") }
    // and it stays within quantization error (2^-24 per element) of the
    // exact expression-path mean
    val exact = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("double")) / count(lit(1))).as("mean"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    a.foreach { case (label, c) =>
      c.zip(exact(label)).foreach { case (q, m) =>
        assert(math.abs(q - m) <= 1.0 / (1 << 24) + 1e-12, s"label $label: $q vs $m")
      }
    }
  }
}
