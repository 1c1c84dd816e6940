package graft.queries

import graft.SparkEntry

/** Round-7 operator properties, checked independently of the DuckDB
  * oracles: the dupspan scrub is recomputed from first principles in plain
  * Scala, the link-prediction candidates are checked against the graph
  * invariants, and the budget selection's greedy-prefix property is
  * asserted from its own output columns.
  */
class Round7Spec extends graft.SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("q436 dupspan scrub matches a from-first-principles recomputation") {
    // Independent reimplementation with Scala collections: normalize,
    // tokenize, mark every position covered by an 8-gram occurring >1 time
    // corpus-wide, scrub, md5. Any drift in the distributed plan (wrong
    // coverage window, lost ordering in the rebuild) shows up here.
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toSeq
    }
    val gramCounts = scala.collection.mutable.Map.empty[String, Int]
    toks.foreach { case (_, w) =>
      if (w.length >= 8)
        w.sliding(8).foreach(g => {
          val k = g.mkString(" "); gramCounts(k) = gramCounts.getOrElse(k, 0) + 1
        })
    }
    val expected = toks.map { case (id, w) =>
      val covered = Array.fill(w.length)(false)
      if (w.length >= 8)
        (0 to w.length - 8).foreach { i =>
          if (gramCounts(w.slice(i, i + 8).mkString(" ")) > 1)
            (i until i + 8).foreach(covered(_) = true)
        }
      val scrubbed = w.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        .mkString(" ")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(scrubbed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      id -> ((w.length.toLong, covered.count(identity).toLong, fp))
    }
    val got = run("q436_dupspan_scrub").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, e) => assert(got(id) === e, s"doc $id") }
    assert(expected.values.exists(_._2 > 0),
      "fixture must contain at least one duplicated span")
  }

  test("q437 link prediction emits only non-adjacent 2-path candidates") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val knn = graft.ext.Similarity
      .annTopKByCell(emb, emb, "vec_id", "embedding", "label", k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = knn.filter { case (a, b) => a < b && knn.contains((b, a)) }
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = run("q437_link_prediction").collect()
    assert(rows.nonEmpty, "mutual-kNN graph must yield candidates")
    rows.foreach { r =>
      val (u, v, cn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(u < v)
      assert(!edges.contains((u, v)), s"($u,$v) is an edge — candidates must be non-adjacent")
      val common = adj.getOrElse(u, Set.empty[Long]) & adj.getOrElse(v, Set.empty[Long])
      assert(common.size.toLong === cn, s"($u,$v) common-neighbor count")
      // mutual top-3 graph: degree can never exceed k
      assert(r.getLong(5) <= 3 && r.getLong(6) <= 3)
    }
  }

  test("q444 k-truss membership implies positive support and closed triangles") {
    val rows = run("q444_ktruss").collect()
    assert(rows.nonEmpty)
    val edges = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val inTruss = rows.filter(_.getLong(3) == 1L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      // a truss edge must have had support in the ORIGINAL graph too
      // (peeling only removes edges, never creates triangles)
      if (r.getLong(3) == 1L) assert(r.getLong(2) >= 1L, s"edge $r")
      assert(r.getLong(4) === 1L, "peel must converge within the fixed rounds")
    }
    // every truss edge participates in a triangle made of truss edges
    def adj(p: Set[(Long, Long)]) = p.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val a = adj(inTruss)
    inTruss.foreach { case (u, v) =>
      assert((a(u) & a(v)).nonEmpty, s"truss edge ($u,$v) lost its triangle")
    }
    assert(inTruss.size < edges.size,
      "fixture must contain both truss and non-truss edges")
  }

  test("q445 holdout labels are consistent and the summary is exact") {
    val rows = run("q445_linkpred_holdout").collect()
    assert(rows.nonEmpty)
    val nCand = rows.head.getLong(4)
    val nRec = rows.head.getLong(5)
    assert(rows.length.toLong === nCand)
    assert(rows.count(_.getLong(3) == 1L).toLong === nRec)
    assert(rows.forall(r => r.getLong(2) >= 1L), "every candidate needs a 2-path")
  }

  test("q439 budget selection satisfies the greedy-prefix property") {
    val rows = run("q439_budget_select").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cumBefore, budget, selected) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(selected === (if (cumBefore < budget) 1L else 0L))
    }
    // both classes must occur, or the gate degenerates
    assert(rows.exists(_.getLong(6) == 1L) && rows.exists(_.getLong(6) == 0L))
  }
}
