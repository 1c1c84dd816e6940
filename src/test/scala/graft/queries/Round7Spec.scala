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

  test("q451 Benford expectations are a complete exact-1e6 distribution") {
    val rows = run("q451_benford_audit").collect()
    assert(rows.map(_.getString(0)).sorted === (1 to 9).map(_.toString))
    assert(rows.map(_.getLong(2)).sum === 1000000L, "P(d) literals must sum to 1")
    val nOrders = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum === nOrders, "every order must contribute a digit")
    rows.foreach(r => assert(r.getLong(4) === r.getLong(3) - r.getLong(2)))
  }

  test("q452 assortativity is a bounded correlation over the doubled edge list") {
    val row = run("q452_degree_assortativity").collect().head
    val (m, r) = (row.getLong(0), row.getDouble(4))
    assert(m > 0 && m % 2 == 0, "directed edge list doubles every undirected edge")
    assert(r >= -1.0 && r <= 1.0)
  }

  test("q453 histogram quantile cuts are rank-feasible and monotone") {
    val rows = run("q453_histogram_quantiles").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === Seq(25, 50, 75, 90, 99))
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), "cum count at the cut must reach the target rank")
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 1023L)
    }
    assert(rows.map(_.getLong(1)).toSeq === rows.map(_.getLong(1)).toSeq.sorted,
      "cut bins must be nondecreasing in the percentile")
    assert(rows.map(_.getDouble(4)).toSeq === rows.map(_.getDouble(4)).toSeq.sorted)
  }

  test("q454 negative samples avoid self-pairs and respect the draw budget") {
    val rows = run("q454_negative_sampling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) !== r.getLong(2), "anchor must never sample itself")
      assert(r.getLong(3) >= -1000001L && r.getLong(3) <= 1000001L)
      assert(r.getLong(4) == 0L || r.getLong(4) == 1L)
    }
    rows.groupBy(_.getLong(0)).foreach { case (a, g) =>
      assert(g.length <= 4, s"anchor $a exceeded the k=4 draw budget")
      assert(g.map(_.getInt(1)).distinct.length === g.length)
    }
  }

  test("q455 Mann-Kendall statistics satisfy the combinatorial bounds") {
    val rows = run("q455_mann_kendall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sStat, var18, z) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(math.abs(sStat) <= n * (n - 1) / 2, "S is bounded by the pair count")
      assert(var18 >= 0L)
      if (var18 > 0L) assert(z.sign == 0.0 || z.sign == math.signum(sStat.toDouble))
    }
  }

  test("q456 Fellegi-Sunter scores decompose into the fixed field weights") {
    val rows = run("q456_fellegi_sunter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = (if (r.getLong(2) == 1L) 1386294L else -1203973L) +
        (if (r.getLong(3) == 1L) 2079442L else -356675L) +
        (if (r.getLong(4) == 1L) 2944439L else -693147L)
      assert(r.getLong(5) === score)
      val want = if (score >= 3000000L) "link"
        else if (score >= 0L) "possible" else "nonlink"
      assert(r.getString(6) === want)
    }
  }

  test("q457 k-fold rotation partitions the corpus exactly") {
    val rows = run("q457_kfold_rotation").collect()
    assert(rows.map(_.getInt(0)).sorted === (0 to 4).toArray)
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === total)
      assert(r.getLong(5) === r.getLong(3) - r.getLong(4))
    }
    assert(rows.map(_.getLong(1)).sum === total, "folds must tile the corpus")
  }

  test("q458 CDC apply honors tombstones and last-writer-wins") {
    val rows = run("q458_cdc_apply").collect()
    assert(rows.nonEmpty)
    val nOrders = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(rows.length < nOrders, "some keys must have been tombstoned")
    rows.foreach { r =>
      assert(r.getLong(2) == 1L || r.getLong(2) == 2L,
        "surviving frontier is the insert or the update, never the delete")
      assert(r.getString(1) === (if (r.getLong(2) == 1L) "I" else "U"))
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 3L)
    }
    assert(rows.exists(_.getLong(2) == 2L), "fixture must exercise updates")
  }

  test("q459 BPE merge matches the sequential left-to-right reference scan") {
    // The relational run-alternation formulation must equal the classic
    // sequential greedy apply. Recompute everything with plain Scala.
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val wordCounts = texts
      .flatMap(_.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1))
      .filter(w => w.length >= 2 && w.length <= 20)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def pairCounts(seqs: Map[Seq[String], Long]): Map[(String, String), Long] =
      seqs.toSeq.flatMap { case (syms, c) =>
        syms.zip(syms.tail).map(p => p -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val seqs0: Map[Seq[String], Long] = wordCounts
      .groupBy(_._1.map(_.toString).toList: Seq[String])
      .view.mapValues(_.values.sum).toMap
    val pc0 = pairCounts(seqs0)
    val (ma, mb) = pc0.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    // sequential greedy leftmost apply
    def applyMerge(s: Seq[String]): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == ma && s(i + 1) == mb) {
          out += (ma + mb); i += 2
        } else { out += s(i); i += 1 }
      }
      out.toSeq
    }
    val pc1 = pairCounts(seqs0.toSeq.map { case (k, v) => applyMerge(k) -> v }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
    val want = pc1.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(10)
      .map { case ((a, b), c) => (ma, mb, a, b, c) }
    val got = run("q459_bpe_merge").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(pc1.keys.exists(p => p._1 == ma + mb || p._2 == ma + mb),
      "fixture must produce at least one post-merge pair involving the new symbol")
  }

  test("q460 token dropout drops ~10% and changes the fingerprint") {
    val rows = run("q460_token_dropout").collect()
    assert(rows.nonEmpty)
    val (tot, dropped) =
      (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val rate = dropped.toDouble / tot
    assert(rate > 0.05 && rate < 0.15, s"drop rate $rate must be near 1/10")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q461 curriculum stages are equi-depth and ranks are a permutation") {
    val rows = run("q461_curriculum_order").collect()
    val n = rows.length
    assert(rows.map(_.getLong(2)).sorted === (1L to n.toLong).toArray,
      "curriculum ranks must be the exact permutation 1..n")
    val sizes = rows.groupBy(_.getInt(3)).view.mapValues(_.length).toMap
    assert(sizes.keySet === Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1, s"equi-depth violated: $sizes")
    // harder documents must never precede easier ones
    val byRank = rows.sortBy(_.getLong(2)).map(_.getLong(1))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a < b })
  }

  test("q463 the null-poisoned NOT IN empties while NOT EXISTS agrees with the null-free form") {
    val r = run("q463_not_in_null_trap").collect().head
    assert(r.getLong(0) === 0L, "ANSI: one NULL must empty the NOT IN")
    assert(r.getLong(1) === r.getLong(2),
      "null-free NOT IN and NOT EXISTS must agree")
    assert(r.getLong(2) > 0L, "fixture must leave unmatched customers")
  }

  test("q468 session_window matches a sequential gap-scan sessionization") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "ts").collect()
      .map { r =>
        val micros = r.get(1) match {
          case t: java.sql.Timestamp =>
            t.getTime * 1000L + t.getNanos / 1000 % 1000
          case d: java.time.LocalDateTime =>
            d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              d.getNano / 1000
        }
        (r.getLong(0), micros)
      }
    val want = events.groupBy(_._1).map { case (u, es) =>
      val ts = es.map(_._2).sorted
      val sizes = scala.collection.mutable.ArrayBuffer[Long](0L)
      var prev = Long.MinValue
      ts.foreach { t =>
        if (prev != Long.MinValue && t - prev >= 30L * 60 * 1000000) sizes += 0L
        sizes(sizes.length - 1) += 1
        prev = t
      }
      u -> ((sizes.length.toLong, ts.length.toLong, sizes.max))
    }
    val got = run("q468_session_window_batch").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (u, w) => assert(got(u) === w, s"user $u") }
    assert(want.values.exists(_._1 > 1), "fixture must contain multi-session users")
  }

  test("q470 FD discovery renders the expected verdicts") {
    val verdicts = run("q470_fd_discovery").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(verdicts("o_orderkey->o_custkey") === 1L, "a key determines everything")
    assert(verdicts("c_custkey->c_nationkey") === 1L)
    assert(verdicts("o_custkey->o_orderstatus") === 0L,
      "a repeat customer with two statuses must violate")
    assert(verdicts("c_nationkey->c_mktsegment") === 0L)
  }

  test("q471 gap accounting reconciles with the true (fault-injected) keyspace") {
    def hash60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(15), 16)
    val keys = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
      .filter(k => hash60(s"loss:$k") % 50 != 0).sorted
    val rows = run("q471_keyspace_gap_audit").collect()
    assert(rows.map(_.getLong(1)).sum === keys.length.toLong)
    val span = keys.last - keys.head + 1
    assert(rows.map(_.getLong(2)).sum === span - keys.length,
      "per-bucket missing counts must sum to the global hole count")
    rows.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L))
    assert(rows.exists(_.getLong(2) > 0L),
      "the injected 2% loss must surface as holes")
    assert(rows.exists(_.getLong(3) > 0L),
      "at least one internal gap must be localized")
  }

  test("q472 DiD cells tile the event table and the estimate recomputes") {
    val r = run("q472_did_estimator").collect().head
    val total = spark.read.parquet(s"$sf0001/events.parquet").count()
    val ns = Seq(1, 3, 5, 7).map(r.getLong)
    assert(ns.sum === total, "the four cells must partition all events")
    assert(ns.forall(_ > 0L), "every 2x2 cell must be populated")
    def mean(i: Int) = r.getLong(i).toDouble / 100.0 / r.getLong(i + 1)
    val did = math.round(((mean(0) - mean(2)) - (mean(4) - mean(6))) * 10000)
    assert(r.getLong(8) === did, "DiD must recompute from the emitted cells")
  }

  test("q473 BH rejections form a prefix of the p-value ranking") {
    val rows = run("q473_bh_fdr").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(2)).sorted === (1L to 5L).toArray,
      "ranks must be the permutation 1..m")
    val byRank = rows.sortBy(_.getLong(2))
    // p-values nondecreasing in rank; rejected set closed downward
    assert(byRank.map(_.getLong(1)).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
    val rej = byRank.map(_.getLong(4))
    assert(rej.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "a rejected test can never rank above an accepted one")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 33L,
        "p numerator must lie in [1, P+1]")
    }
  }

  test("q450 harmonic centrality decomposes into its hop counts") {
    val rows = run("q450_harmonic_centrality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2, n3, h) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n1 >= 1L && n1 <= 3L, "hop-1 reach is the degree, capped at k=3")
      assert(h === n1 * 1000000L + n2 * 500000L + n3 * 333333L)
    }
  }

  test("q449 KMV estimates carry their exact audit") {
    val rows = run("q449_kmv_intersect").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0 && r.getDouble(3) > 0.0 &&
        r.getDouble(4) > 0.0, "set-size estimates must be positive")
      assert(r.getLong(6) >= 0L)
    }
    assert(rows.exists(_.getLong(6) > 0L),
      "fixture must contain genuinely overlapping presence sets")
  }

  test("q474 embeddedness is bounded by the smaller open neighborhood") {
    val rows = run("q474_edge_embeddedness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (emb, da, db) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(emb <= math.min(da, db) - 1,
        "common neighbors exclude the edge partner itself")
      assert(r.getLong(5) === (if (emb == 0L) 1L else 0L))
    }
    assert(rows.exists(_.getLong(5) == 1L) && rows.exists(_.getLong(5) == 0L),
      "fixture must contain both bridges and embedded ties")
  }

  test("q475 AUC matches a brute-force pairwise comparison") {
    val data = spark.read.parquet(s"$sf0001/events.parquet")
      .select("value", "event_type").collect()
      .map(r => (BigDecimal(r.getDouble(0)).setScale(2,
        scala.math.BigDecimal.RoundingMode.HALF_UP) * 100,
        if (r.getString(1) == "purchase") 1 else 0))
    val pos = data.filter(_._2 == 1).map(_._1)
    val neg = data.filter(_._2 == 0).map(_._1)
    // 2U = #{pos > neg}*2 + #{ties} over all cross pairs
    var u2 = 0L
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val r = run("q475_mann_whitney_auc").collect().head
    assert(r.getLong(0) === pos.length.toLong)
    assert(r.getLong(1) === neg.length.toLong)
    assert(r.getLong(2) === u2, "rank-form 2U must equal the pairwise count")
    assert(r.getLong(3) === u2 * 1000000L / (2L * pos.length * neg.length))
  }

  test("q477 chunk census and overlap mass follow the stride arithmetic") {
    val rows = run("q477_overlap_chunking").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, chunks, overlap, ok) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(chunks === (n - 1) / 24 + 1, s"chunk count for n=$n")
      // overlap = sum over non-first chunks of min(8, tokens they re-cover)
      val expected = (1L until chunks).map(i => math.min(32L, n - i * 24L))
        .sum + math.min(32L, n) - n
      assert(overlap === expected, s"overlap mass for n=$n")
      assert(ok === 1L, "round-trip must hold for every document")
    }
  }

  test("q479 report rows degrade monotonically with the threshold") {
    val rows = run("q479_classification_report").collect().sortBy(_.getLong(0))
    assert(rows.length === 3)
    // raising the threshold can only shrink the predicted-positive set
    val tps = rows.map(_.getLong(1))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b })
    val recalls = rows.map(_.getLong(5))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getLong(4) <= 1000000L && r.getLong(5) <= 1000000L
        && r.getLong(6) <= 1000000L)
    }
  }

  test("q484 melt emits one row per (status, metric) and preserves values") {
    val rows = run("q484_unpivot_melt").collect()
    val statuses = rows.map(_.getString(0)).distinct.sorted
    val metrics = rows.map(_.getString(1)).distinct.sorted
    assert(rows.length === statuses.length * metrics.length)
    assert(metrics === Array("max_cents", "min_cents", "n_orders", "sum_cents"))
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    statuses.foreach { st =>
      assert(byKey((st, "min_cents")) <= byKey((st, "max_cents")))
      assert(byKey((st, "n_orders")) > 0L)
    }
  }

  test("q485 try arithmetic null outcomes match their algebraic conditions") {
    val rows = run("q485_try_arithmetic").collect()
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) === n, "value/0 must be NULL for every row")
      assert(r.getLong(3) <= n && r.getLong(4) <= n)
      assert(r.getLong(3) > 0L, "odd event_ids must overflow the add")
    }
  }

  test("q486 percentile_disc returns ordered actual data elements") {
    val values = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet).toMap
    val rows = run("q486_percentile_disc").collect()
    rows.foreach { r =>
      val (t, p50, p90, p99) =
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99)
      assert(values(t).contains(p50) && values(t).contains(p90)
        && values(t).contains(p99), "discrete percentiles must be data elements")
    }
  }

  test("q487 RAKE keyphrases exclude stopwords and score positively") {
    val stops = Set("the", "a", "an", "of", "and", "to", "in", "is",
      "for", "on", "with")
    val rows = run("q487_rake_keywords").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getString(0).split(" ").forall(w => !stops.contains(w)),
        s"phrase '${r.getString(0)}' leaked a stopword")
      assert(r.getLong(2) > 0L)
    }
  }

  test("q488 JSD is bounded by [0, ln 2] up to per-term rounding") {
    val rows = run("q488_jsd_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (jsd, nl) = (r.getLong(1), r.getLong(2))
      assert(jsd >= -nl, s"JSD must be nonnegative up to rounding: $jsd")
      assert(jsd <= 693148L + nl, s"JSD is bounded by ln 2: $jsd")
    }
  }

  test("q489 HHI lies between perfect balance and monopoly") {
    val rows = run("q489_hhi_concentration").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (g, hhi) = (r.getLong(1), r.getLong(2))
      assert(hhi >= 1000000L / g - 1, s"HHI below the equal-share floor: $hhi")
      assert(hhi <= 1000000L)
    }
  }

  test("q490/q491/q493 correlation statistics stay in [-1, 1]") {
    run("q490_kendall_tau").collect().foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0)
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(1),
        "C + D cannot exceed the pair count")
    }
    run("q491_acf").collect().foreach(r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
    run("q493_cross_correlation").collect().foreach(r =>
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-12))
  }

  test("q494 SES errors match the sequential half-alpha recursion") {
    val daily = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("ts").cast("date").as("d"))
      .count().collect()
      .map(r => (r.getString(0), r.get(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      var s = xs.head.toDouble
      var errSum = 0L
      xs.tail.foreach { x =>
        // forecast is s; error in micro units with exact binary arithmetic
        errSum += math.round(math.abs(x - s) * 1000000).toLong
        s = (x + s) / 2.0
      }
      t -> ((xs.length - 1).toLong, errSum)
    }
    val got = run("q494_ses_forecast_eval").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    want.foreach { case (t, (n, errSum)) =>
      assert(got(t)._1 === n, s"forecast count for $t")
      // the query floors each per-day error; the double recursion is exact
      // for binary alpha, so totals agree within n forecasts of slack
      assert(math.abs(got(t)._2 - errSum) <= n, s"error mass for $t")
    }
  }
}
