package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine._
import graft.ext._

/** Model-eval and distribution-statistics queries — the measurement half of a
  * training-data pipeline: sketch rollups across corpus slices, classifier
  * evaluation (AUC, calibration, agreement), and distribution-drift tests
  * (chi-square association, KL divergence, KS distance, Gini concentration).
  * Every query keeps the cross-engine arithmetic exact: integer/decimal
  * aggregation everywhere, with at most a single final IEEE double division
  * (or the q194 micro-nat log quantization) per output column.
  */
object EvalQueries {

  /** DuckDB fragment: normalized text (mirror of Cleaning.normalizeText). */
  private val NormText = raw"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"

  /** DuckDB fragment: whitespace tokens of the normalized text. */
  private val Toks = s"string_split($NormText, ' ')"

  /** DuckDB fragment: distinct word n-gram shingles of token list `w`. */
  private def duckShingles(w: String, n: Int): String =
    s"list_distinct([array_to_string($w[i:i+${n - 1}], ' ') FOR i IN generate_series(1, len($w) - ${n - 1})])"

  val qs: Seq[Q] = Seq(

    // Mergeable MinHash rollup — the sketch-algebra property that makes
    // MinHash usable as a corpus-slice similarity SUMMARY, not just a pair
    // filter: the element-wise MIN of two signatures IS the signature of the
    // union, so per-source signatures aggregate map-side-partially like any
    // min() (one shuffle on (source, slot), no doc×doc work), and the
    // matching-slot fraction between two merged signatures estimates the
    // Jaccard similarity of the sources' shingle SETS. At 100 TB the rollup
    // output is |sources| × 64 rows regardless of corpus size.
    Q(
      "q215_minhash_rollup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sigs = NearDup.minHashSignatureFrame(
          NearDup.shingleFrame(docs, "doc_id", "text", n = 3), "doc_id", k = 64)
        val slots = sigs
          .join(docs.select("doc_id", "source"), "doc_id")
          .select(col("source"), posexplode(col("__sig")).as(Seq("slot", "v")))
        val merged = slots.groupBy("source", "slot").agg(min("v").as("mv"))
        merged.as("a")
          .join(merged.as("b"),
            col("a.slot") === col("b.slot") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(sum(when(col("a.mv") === col("b.mv"), 1L).otherwise(0L)).as("n_equal_slots"))
          .select(col("source_a"), col("source_b"), col("n_equal_slots"),
            (col("n_equal_slots").cast("double") / lit(64.0)).as("est_jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, source, ${duckShingles(Toks, 3)} AS sh FROM documents
        ), sigs AS (
          SELECT doc_id, source,
                 [list_min([((s * 2654435761 % ${NearDup.MinHashP - 1} + 1)
                             * (${TextHash.duckHash60("x")} % ${NearDup.MinHashP}) + s)
                            % ${NearDup.MinHashP} FOR x IN sh])
                  FOR s IN generate_series(0, 63)] AS sig
          FROM d WHERE len(sh) > 0
        ), slots AS (
          SELECT source, s AS slot, min(sig[s + 1]) AS mv
          FROM sigs CROSS JOIN range(0, 64) t(s)
          GROUP BY 1, 2
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS BIGINT) AS n_equal_slots,
               CAST(SUM(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS DOUBLE) / 64.0
                 AS est_jaccard
        FROM slots a JOIN slots b ON a.slot = b.slot AND a.source < b.source
        GROUP BY 1, 2 ORDER BY source_a, source_b
      """.trim)),

    // Exact tie-corrected ROC AUC of a quality signal (n_chars) against a
    // binary relevance label (lang = 'en') — the Mann-Whitney rank form.
    // The classic computation needs a GLOBAL rank over every scored row (a
    // single-task sort at scale); here scores are first collapsed to
    // (score, count, positives) groups and the exclusive cumulative count
    // comes from the two-phase prefix sum (Keys.globalRunningSum), so no
    // unpartitioned window exists at any size. All rank algebra stays in
    // integers — 2×(sum of average positive ranks) = Σ n_pos(g)·(2·before(g)
    // + count(g) + 1) — and AUC is one final division:
    // (sum2 - n_pos·(n_pos+1)) / (2·n_pos·n_neg).
    Q(
      "q216_auc_quality",
      (s, dir) => {
        val grp = Tables.documents(s, dir)
          .select(col("n_chars"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .groupBy("n_chars")
          .agg(count(lit(1)).as("cnt"), sum("pos").as("npos"))
        Keys.globalRunningSum(grp, "n_chars", "cnt", "cum")
          .select(col("npos"), col("cnt"),
            (col("npos") * (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L)))
              .as("r2"))
          .agg(sum("npos").as("n_pos"),
            sum(col("cnt") - col("npos")).as("n_neg"),
            sum("r2").as("sum2"))
          .select(col("n_pos"), col("n_neg"),
            ((col("sum2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double")
              / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
      },
      Some("""
        WITH g AS (
          SELECT n_chars, COUNT(*) AS cnt,
                 SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS npos
          FROM documents GROUP BY 1
        ), c AS (
          SELECT npos, cnt,
                 SUM(cnt) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum
          FROM g
        ), t AS (
          SELECT CAST(SUM(npos) AS BIGINT) AS n_pos,
                 CAST(SUM(cnt - npos) AS BIGINT) AS n_neg,
                 CAST(SUM(npos * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS sum2
          FROM c
        )
        SELECT n_pos, n_neg,
               CAST(sum2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
        FROM t
      """.trim)),

    // Classifier calibration (reliability bins): bucket the language-ID
    // evidence score (English-profile hit rate, kept as an INTEGER
    // milli-ratio so binning never compares doubles) into deciles and
    // report predicted-vs-observed positive rate per bin. Integer sums per
    // bin; the two output rates are each one final division. Map-side
    // expression work + one grouped aggregate — scales like any rollup.
    Q(
      "q217_calibration_bins",
      (s, dir) => {
        val enWords = TextAnalysis.LangProfiles.toMap.apply("en")
        Tables.documents(s, dir)
          .select(TextAnalysis.tokens(col("text")).as("w"), col("lang"))
          .select(size(col("w")).cast("long").as("n_tok"),
            size(filter(col("w"), t => t.isInCollection(enWords))).cast("long").as("n_en"),
            when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
          .filter(col("n_tok") > 0)
          .withColumn("pred_milli", expr("n_en * 1000 div n_tok"))
          .withColumn("bin", least(expr("pred_milli div 20"), lit(9L)))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum("pred_milli").as("sum_milli"),
            sum("pos").as("n_pos"))
          .select(col("bin"), col("n_docs"),
            (col("sum_milli").cast("double")
              / (col("n_docs").cast("double") * lit(1000.0))).as("avg_pred"),
            (col("n_pos").cast("double") / col("n_docs").cast("double")).as("frac_pos"))
          .orderBy("bin")
      },
      Some(s"""
        WITH t AS (
          SELECT CAST(len(w) AS BIGINT) AS n_tok,
                 CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is')))
                   AS BIGINT) AS n_en,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM (SELECT $Toks AS w, lang FROM documents)
          WHERE len(w) > 0
        ), b AS (
          SELECT least((n_en * 1000 // n_tok) // 20, 9) AS bin,
                 n_en * 1000 // n_tok AS pred_milli, pos
          FROM t
        )
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(pred_milli) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000.0)
                 AS avg_pred,
               CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_pos
        FROM b GROUP BY 1 ORDER BY bin
      """.trim))
  )
}
