package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class CentroidAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator centroids match the exact expression formulation") {
    val e = Tables.embeddings(spark, sf0001)
    val dim = e.select(size(col("embedding"))).head.getInt(0)

    val byAgg = e.select(col("label"), col("embedding").as("v"))
      .as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new CentroidAggregator(dim).toColumn.name("centroid"))
      .collect().toMap

    val byExpr = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("double")) / count(lit(1))).as("mean"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }

    assert(byAgg.keySet === byExpr.keySet)
    byAgg.foreach { case (label, centroid) =>
      val expected = byExpr(label)
      assert(centroid.length === dim)
      centroid.zip(expected).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label: $a vs $b")
      }
    }
  }
}
