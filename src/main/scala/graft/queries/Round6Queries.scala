package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Sketches, TextAnalysis, TextHash}

/** Round-6 additions (SURVEY §2.16): the second SparkSessionExtensions seam
  * (the injected optimizer-rule + planner-strategy path, complementing
  * q400's function-injection gate) and threshold-based CMS heavy-hitter
  * extraction with its exact audit twin. Same discipline as every other
  * module: deterministic hashes, integer counts, one final double division,
  * DuckDB oracle mirrors derived from first principles.
  */
object Round6Queries {

  /** DuckDB fragment: normalized text (mirror of Cleaning.normalizeText). */
  private val NormText = raw"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"

  /** DuckDB fragment: whitespace tokens of the normalized text. */
  private val Toks = s"string_split($NormText, ' ')"

  val qs: Seq[Q] = Seq(

    // The GraftExtensions PLUGIN RULE path, value-gated end-to-end: q400
    // proves the plugin injects the native FUNCTIONS; this proves it
    // injects the OPTIMIZER REWRITE (window-rank-filter -> heap top-k) and
    // the PLANNER STRATEGY that makes the rewritten node physical. The
    // session is built through the public `withExtensions` hook with
    // NEITHER GraftFunctions.ensureRegistered NOR TopKRankInstall
    // .ensureInstalled called on it — and the builder-fresh sessionState is
    // asserted to carry zero experimental extraOptimizations/extraStrategies,
    // so the only possible source of the TopKPerKey plan is the plugin
    // injection. The in-builder require pins the plan (the heap operator
    // must appear in the executed plan); the oracle gates the values (the
    // per-customer top-3 orders under a total order). Same leave-no-trace
    // active/default-session discipline as q400.
    Q(
      "q428_extensions_rule_gate",
      (s, dir) => {
        import org.apache.spark.sql.SparkSession
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        val s2 = try SparkSession.builder()
            .withExtensions(new graft.GraftExtensions())
            .getOrCreate()
          finally {
            SparkSession.setDefaultSession(s)
            SparkSession.setActiveSession(s)
          }
        require(s2 ne s, "builder must construct a fresh extension-loaded session")
        require(s2.experimental.extraOptimizations.isEmpty
            && s2.experimental.extraStrategies.isEmpty,
          "fresh session must have no post-hoc experimental installs — " +
            "the rewrite must come from the injected plugin alone")
        Tables.orders(s2, dir).createOrReplaceTempView("graft_ext_orders")
        val df = s2.sql("""
          SELECT o_custkey, o_orderkey, o_totalprice, rnk
          FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                FROM graft_ext_orders)
          WHERE rnk <= 3
          ORDER BY o_custkey, rnk
        """)
        require(df.queryExecution.executedPlan.toString.contains("TopKPerKey"),
          "injected TopKRankRewrite + TopKPerKeyStrategy must plan the heap top-k")
        df
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
              FROM orders)
        WHERE rnk <= 3
        ORDER BY o_custkey, rnk
      """.trim)),

    // CMS threshold heavy hitters with the exact audit twin (the q169
    // pattern): q76 displays sketch estimates FOR the known exact top-10;
    // this is the production extraction direction — every token whose CMS
    // estimate clears phi*N (phi = 1/100) is emitted as a claimed heavy
    // hitter, with its exact count and an is_true_hitter flag alongside so
    // the sketch's one-sided error (false positives only: est >= exact
    // always) is auditable row by row. Scale shape: the sketch is
    // depth x width cells (constant, broadcast); the probe set is the
    // vocabulary (Heaps-law growth — shuffle-hash joined, NEVER broadcast);
    // the total is a single-row aggregate crossJoin. Deterministic row
    // hashes make the sketch engine-reproducible, so even the estimates
    // hash-match the oracle.
    Q(
      "q429_cms_threshold_hitters",
      (s, dir) => {
        val tok = Tables.documents(s, dir)
          .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        val total = tok.agg(count(lit(1)).as("n_total"))
        val cells = Sketches.cmsCells(tok, "token", depth = 4, width = 256)
        val vocab = tok.groupBy("token").agg(count(lit(1)).as("exact_n"))
        Sketches.cmsEstimate(cells, vocab.select("token"), "token",
            depth = 4, width = 256)
          .join(vocab.hint("shuffle_hash"), Seq("token"))
          .crossJoin(broadcast(total))
          .filter(col("cms_est") * 100 >= col("n_total"))
          .select(col("token"), col("cms_est"), col("exact_n"),
            when(col("exact_n") * 100 >= col("n_total"), 1L).otherwise(0L)
              .as("is_true_hitter"))
          .orderBy(col("cms_est").desc, col("token"))
      },
      Some(s"""
        WITH tok AS (
          SELECT unnest($Toks) AS token FROM documents
        ), tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok
        ), cells AS (
          SELECT j, h % 256 AS bucket, COUNT(*) AS cnt FROM (
            SELECT r.j AS j,
                   ${TextHash.duckHash60("'cms' || CAST(r.j AS VARCHAR) || ':' || token")} AS h
            FROM tok CROSS JOIN range(0, 4) r(j))
          GROUP BY 1, 2
        ), vocab AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n FROM tok GROUP BY token
        ), est AS (
          SELECT token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cms_est FROM (
            SELECT v.token AS token, r.j AS j,
                   ${TextHash.duckHash60("'cms' || CAST(r.j AS VARCHAR) || ':' || v.token")}
                     % 256 AS bucket
            FROM vocab v CROSS JOIN range(0, 4) r(j)) p
          LEFT JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
          GROUP BY token
        )
        SELECT e.token AS token, e.cms_est, v.exact_n,
               CAST(CASE WHEN v.exact_n * 100 >= t.n_total THEN 1 ELSE 0 END
                 AS BIGINT) AS is_true_hitter
        FROM est e JOIN vocab v ON e.token = v.token CROSS JOIN tot t
        WHERE e.cms_est * 100 >= t.n_total
        ORDER BY cms_est DESC, token
      """.trim))
  )
}
