package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{IvfPq, Similarity}

/** Round-14 additions — executing VERDICT_r13's list. Opens with the
  * derived-cell lifecycle contract made MEASURABLE:
  *   - q529: the IVF-PQ index family now rides q524's derived cell rule
  *     (planes = f(corpus size), cells ≈ n/64 — SharedFrames.ivfPqIndex
  *     and every build/ingest/rebuild/maintenance gate re-celled this
  *     round); this gate pins the two numbers that make the whole
  *     lifecycle scale-honest, at every SF: the cell count follows the
  *     rule (so in-cell work stays corpus-linear), and the search
  *     coordinator's probed-cell list stays bounded by probes x nprobe
  *     (so the static partition filter reads a bounded file set however
  *     large the corpus grows).
  * Same determinism discipline as the whole registry: integer counts,
  * pinned flags as functions of measured values, DuckDB oracle twins
  * from first principles.
  */
object Round14Queries {

  val qs: Seq[Q] = Seq(

    // Derived-cell + probe-bound contract of the IVF-PQ LIFECYCLE —
    // VERDICT_r13 next #1's "done" clause, measured: q524 proved the
    // cells-follow-corpus-size rule for the standalone SRP gate; round 14
    // moved the whole index family onto it, and THIS gate hash-pins the
    // scale claims at any SF from the PERSISTED artifact:
    //   - n_cells = the artifact's coarse-quantizer size, which must obey
    //     the q524 rule ((1 << planes) * 64 >= n, minimal) — 8 cells at
    //     sf0.01, 32 at sf0.1, 512 at the 10x rehearsal, so expected cell
    //     size stays ~64 and every in-cell stage stays corpus-linear;
    //   - n_probed_cells = the distinct cells the q495 search
    //     coordinator's nprobe pick visits, which must stay within
    //     probes x nprobe (the bounded collect that becomes the static
    //     partition filter — bounded FILE IO at 100 TB, not just bounded
    //     compute).
    // Both flags are pinned functions of the measured values (the
    // q169/q499 envelope pattern); the counts themselves are the
    // deliverable. 1-row bounded gate; all reads are metadata-sized
    // (centroids, 50 probes) except one corpus count.
    Q(
      "q529_ivfpq_derived_cells_probe_bound",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        val e = Tables.embeddings(s, dir)
        val n = e.count()
        val planes = IvfPq.derivedPlanes(n)
        val ix = SharedFrames.ivfPqIndex(s, dir)
        val nCells = ix.cents.count()
        val probes = Similarity.hashOrderedProbes(e, "vec_id", "ivfpq", 50)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        // the q495 coordinator's own nprobe pick (adcShortlist's qc stage)
        val qc = graft.plans.TopKPerKey.of(
            probes.crossJoin(broadcast(ix.cents))
              .select(col("query_id"), col("cell"),
                IvfPq.d2(col("qv"), col("centroid")).as("qd2")),
            keyCols = Seq("query_id"),
            order = Seq("qd2" -> true, "cell" -> true), k = 4)
        val nProbed = qc.select("cell").distinct().count()
        val df = s.range(1).select(
          lit(n).as("n_vectors"),
          lit(planes.toLong).as("n_planes"),
          lit(nCells).as("n_cells"),
          lit(nProbed).as("n_probed_cells"),
          when(lit((1L << planes) * 64L >= n)
              && lit(planes == 1 || (1L << (planes - 1)) * 64L < n),
            lit(1L)).otherwise(lit(0L)).as("cells_rule_ok"),
          when(lit(nProbed <= 50L * 4L), lit(1L)).otherwise(lit(0L))
            .as("probe_bound_ok"))
        df
      },
      Some(s"""
        WITH ${Round9Queries.pqCte("x", "TRUE")}, probes AS (
          SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          ORDER BY ${graft.ext.TextHash.duckHash60(
            "'ivfpq#' || CAST(vec_id AS VARCHAR)")}, vec_id
          LIMIT 50
        ), qc AS (
          SELECT query_id, cell FROM (
            SELECT p.query_id, c.cell,
                   row_number() OVER (PARTITION BY p.query_id
                     ORDER BY list_sum([
                       (CAST(p.qv[i] AS DOUBLE) - c.centroid[i])
                       * (CAST(p.qv[i] AS DOUBLE) - c.centroid[i])
                       FOR i IN generate_series(1, 64)]), c.cell) AS rn
            FROM probes p CROSS JOIN xcents c)
          WHERE rn <= 4
        ), nums AS (
          SELECT (SELECT COUNT(*) FROM embeddings) AS n_vectors,
                 (SELECT planes FROM xpl) AS n_planes,
                 (SELECT COUNT(*) FROM xcents) AS n_cells,
                 (SELECT COUNT(DISTINCT cell) FROM qc) AS n_probed_cells
        )
        SELECT CAST(n_vectors AS BIGINT) AS n_vectors,
               CAST(n_planes AS BIGINT) AS n_planes,
               CAST(n_cells AS BIGINT) AS n_cells,
               CAST(n_probed_cells AS BIGINT) AS n_probed_cells,
               CAST(CASE WHEN (CAST(1 AS BIGINT) << n_planes) * 64 >= n_vectors
                          AND (n_planes = 1 OR
                               (CAST(1 AS BIGINT) << (n_planes - 1)) * 64 < n_vectors)
                         THEN 1 ELSE 0 END AS BIGINT) AS cells_rule_ok,
               CAST(CASE WHEN n_probed_cells <= 200 THEN 1 ELSE 0 END AS BIGINT)
                 AS probe_bound_ok
        FROM nums
      """.trim)),

    // LOG-COORDINATED MERGE — VERDICT_r13 next #2: the partition-scoped
    // merge semantics (Sinks.applyChangesPartitioned: delete by key at a
    // named partition, upsert by key, cell-move = delete-at-old +
    // insert-at-new) routed THROUGH the commit log (TxLog.applyChanges):
    // each attempt merges against the snapshot it observed and claims the
    // next version; a lost claim re-merges on the new snapshot, so
    // concurrent writers COMPOSE (spec-pinned: disjoint and same-partition
    // writers both land, a mid-commit reader sees the prior snapshot, a
    // wrong-partition delete aborts with nothing committed). Landing this
    // round also surfaced and closed a real protocol hole: the claim
    // target used to come from a SECOND directory listing taken after the
    // snapshot read, so a commit landing between the two reads could be
    // leapfrogged — a silent lost update; snapshot and target now derive
    // from one listing, making any interleaved commit fail the claim into
    // a rebase. THIS gate oracle-checks the merge content end to end:
    // seed all documents (v0, log-coordinated upsert), then one change
    // batch (v1) that deletes an en hash-slice, doubles another en
    // slice's n_chars in place, and clones a zh slice into de under
    // negative ids (the cross-partition insert). The read-back must be
    // exactly the merged table with the version chain pinned in the value.
    // 100 TB: per-commit IO = touched partitions + staged delta; the
    // claim is one atomic create; an emptied partition drops out of the
    // manifest with no directory surgery.
    Q(
      "q530_txlog_coordinated_merge",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        val scr = graft.engine.Scratch.dir(s, dir, "txlog_merge_gate")
        graft.engine.Scratch.rm(scr)
        val t = s"$scr/t"
        val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "lang")
        graft.engine.TxLog.upsertPartitioned(s, t, docs, "doc_id", "lang")
        val b = pmod(graft.ext.TextHash.hash60(
          concat(lit("txm#"), col("doc_id").cast("string"))), lit(8L))
        val deletes = docs
          .filter(col("lang") === "en" && b === 0L)
          .select(col("doc_id"), col("lang"))
        val upserts = docs
          .filter(col("lang") === "en" && b === 1L)
          .withColumn("n_chars", col("n_chars") * 2L)
          .unionByName(docs.filter(col("lang") === "zh" && b === 2L)
            .select((-col("doc_id") - lit(1L)).as("doc_id"),
              col("n_chars"), lit("de").as("lang")))
        graft.engine.TxLog.applyChanges(
          s, t, deletes, upserts, "doc_id", "lang")
        graft.engine.TxLog.read(s, t)
          .withColumn("txlog_version",
            lit(graft.engine.TxLog.snapshot(s, t).version))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, n_chars, lang,
                 ${graft.ext.TextHash.duckHash60(
                   "'txm#' || CAST(doc_id AS VARCHAR)")} % 8 AS bkt
          FROM documents
        )
        SELECT doc_id,
               CAST(CASE WHEN lang = 'en' AND bkt = 1 THEN n_chars * 2
                    ELSE n_chars END AS BIGINT) AS n_chars,
               lang, CAST(1 AS BIGINT) AS txlog_version
        FROM b WHERE NOT (lang = 'en' AND bkt = 0)
        UNION ALL
        SELECT -doc_id - 1, CAST(n_chars AS BIGINT), 'de',
               CAST(1 AS BIGINT)
        FROM b WHERE lang = 'zh' AND bkt = 2
        ORDER BY doc_id
      """.trim))
  )
}
