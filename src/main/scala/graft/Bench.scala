package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract). Measures full materialization of every
  * registered query via a noop-format write — `.count()` would let Catalyst
  * prune projection-only work (window columns, cleaning expressions) and
  * under-measure. One warm-up query absorbs session/codegen startup so the
  * first measured entry isn't inflated.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Warm-up: JIT/codegen/session init on a real query, unmeasured.
    try materialize("q01_pricing_summary") catch { case _: Throwable => () }
    // Min over 2 INTERLEAVED full passes: this box is a shared VM and
    // CPU-steal windows randomly inflate single-shot wall-clock by 10x+
    // (observed: the same query at 2.5s and 50s across consecutive runs,
    // plan unchanged; BENCH_r02 caught a multi-minute window that inflated
    // back-to-back runs of the SAME query 4x). Interleaving puts each
    // query's timed runs a whole pass apart, so a steal window shorter than
    // a pass can inflate at most one of them; the min is the reproducible
    // cost of the plan. Failures are reported, not silently timed.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 2).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        try materialize(name) catch {
          case e: Throwable => System.err.println(s"BENCH-FAIL $name: $e")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
      }
    }
    val results = names.map(n => n -> best(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Short total-only line FIRST: the driver stores only the tail of the
    // output, and the per-query map outgrew it in round 3 (BENCH_r03 kept a
    // truncated JSON with parsed:null). The compact line always survives.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
