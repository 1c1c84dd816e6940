package graft.engine

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-based SCD2 invariants (SURVEY.md section 5.3): for RANDOM change
  * sets — arbitrary partitions of the key space into unchanged / changed /
  * deleted-from-incoming / brand-new — the merge must preserve the
  * type-2 contract:
  *   1. exactly one is_valid row per natural key present in the output;
  *   2. every expired (previously-current) version's end_dt equals the run
  *      timestamp, and its key has a fresh successor starting then;
  *   3. unchanged current rows pass through bit-identical;
  *   4. surrogate keys remain collision-free and extend past the watermark.
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private val run1 = "2021-01-01 00:00:00"
  private val run2 = "2022-06-15 00:00:00"
  private val sentinel = "2099-12-31 00:00:00"

  private val scenarios: Gen[(Int, Set[Long], Set[Long], Set[Long])] = for {
    n <- Gen.choose(1, 40)
    keys = (1L to n.toLong).toSet
    changed <- Gen.someOf(keys)
    dropped <- Gen.someOf(keys -- changed)
    newKeys <- Gen.someOf((n.toLong + 1) to (n.toLong + 10))
  } yield (n, changed.toSet, dropped.toSet, newKeys.toSet)

  test("SCD2 merge invariants hold for random change sets") {
    // plain ScalaCheck sampling with pinned seeds (the scalatestplus bridge
    // is not in the offline artifact cache): 15 deterministic scenarios
    val params = Gen.Parameters.default
    (0 until 15).foreach { i =>
      val (n, changed, dropped, newKeys) =
        scenarios.apply(params, Seed(745912L + i)).get
        val existingKeys = (1L to n.toLong).toSeq
        val existing = Scd2.bootstrap(
          existingKeys.map(k => (k, s"name_$k", s"attr_${k % 3}")).toDF("id", "name", "attr"),
          naturalKey = "id", skCol = "sk", runTs = run1, sentinel = sentinel)

        val incoming = (existingKeys.filterNot(dropped).map { k =>
          if (changed(k)) (k, s"name_$k", s"attr_CHANGED") else (k, s"name_$k", s"attr_${k % 3}")
        } ++ newKeys.toSeq.sorted.map(k => (k, s"name_$k", s"attr_new")))
          .toDF("id", "name", "attr")

        val out = Scd2.merge(existing, incoming,
          naturalKey = "id", scdCols = Seq("name", "attr"),
          skCol = "sk", runTs = run2, sentinel = sentinel).cache()
        try {
          val rows = out.collect().map { r =>
            (r.getAs[Long]("id"), r.getAs[Long]("sk"), r.getAs[String]("attr"),
              r.getAs[java.sql.Timestamp]("end_dt").toString,
              r.getAs[Boolean]("is_valid"))
          }
          // 1. one valid row per key
          val validPerKey = rows.filter(_._5).groupBy(_._1).view.mapValues(_.length)
          assert(validPerKey.values.forall(_ == 1), s"multiple valid rows: $validPerKey")
          // dropped keys keep their old current row (absence from incoming
          // is not a change — reference semantics)
          val realChanged = changed.filterNot(dropped)
          // 2. expired rows: exactly the changed keys, ended at run2, with successor
          val expired = rows.filter(r => !r._5)
          assert(expired.map(_._1).toSet == realChanged, s"expired=${expired.toSeq} changed=$realChanged")
          assert(expired.forall(_._4.startsWith("2022-06-15")))
          realChanged.foreach { k =>
            val successor = rows.filter(r => r._1 == k && r._5)
            assert(successor.length == 1 && successor.head._3 == "attr_CHANGED")
          }
          // 3. unchanged keys keep attr and validity
          (existingKeys.toSet -- realChanged).foreach { k =>
            val cur = rows.filter(r => r._1 == k && r._5)
            assert(cur.length == 1 && cur.head._3 != "attr_CHANGED")
          }
          // 4. surrogate keys collision-free; fresh ones past the watermark
          val sks = rows.map(_._2)
          assert(sks.distinct.length == sks.length, "surrogate key collision")
          val watermark = existingKeys.length.toLong
          val freshSks = rows.filter(r => newKeys(r._1)).map(_._2)
          assert(freshSks.forall(_ > watermark))
        } finally out.unpersist()
    }
  }
}
