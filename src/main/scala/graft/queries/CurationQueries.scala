package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.text.{Mix, TextOps}

/** Round-6 curation surface: weighted sampling without replacement and
  * DSIR importance weighting — the two selection primitives between
  * "score every document" and "assemble the mix".
  */
object CurationQueries {

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Efraimidis–Spirakis weighted sample: 100 docs drawn without
    // replacement with odds ∝ n_chars; the ln(u)/w key is rounded to
    // 9 dp before ranking (with doc_id tie-break) so the cut replays
    // engine-exact — the q102 rounded-score-cut technique
    "q110_weighted_sample" -> ((s, d) =>
      Mix.weightedSample(docs(s, d), col("n_chars"), n = 100, seed = 7)
        .orderBy("rank")),

    // DSIR importance weights vs the English sub-corpus: hashed-unigram
    // bag log-likelihood ratio, integer micro-nat quantized per bucket
    // so the per-doc sum is exact integer arithmetic
    "q111_dsir_weights" -> ((s, d) =>
      TextOps.dsirWeights(docs(s, d), col("lang") === "en")
        .orderBy("doc_id")),

    // multinomial Naive Bayes language classifier: train on
    // doc_id % 10 != 0, classify the held-out tenth, output the
    // confusion matrix — scores are exact integer micro-nat sums so the
    // argmax replays engine-exact
    "q113_nb_classifier" -> ((s, d) =>
      TextOps.nbClassify(docs(s, d))
        .orderBy("label_true", "label_pred")))

  def oracle: Map[String, String] = Map(

    "q110_weighted_sample" ->
      """WITH k AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             ROUND(LN((CAST(CAST('0x' || SUBSTR(MD5('7:' || CAST(doc_id AS VARCHAR)), 1, 15)
                              AS BIGINT) AS DOUBLE) + 1.0)
                      / POW(CAST(2.0 AS DOUBLE), 60))
                   / CAST(n_chars AS DOUBLE), 9) AS key
           FROM documents),
         r AS (
           SELECT *, ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS "rank"
           FROM k)
         SELECT doc_id, w, key, "rank" FROM r
         WHERE "rank" <= 100 ORDER BY "rank" """,

    "q111_dsir_weights" ->
      """WITH t AS (
           SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(text, '\s+')) AS tok
           FROM documents),
         tb AS (
           SELECT doc_id, tok,
                  CAST('0x' || SUBSTR(MD5(tok), 1, 15) AS BIGINT) % 1024 AS b
           FROM t),
         raw AS (SELECT b, COUNT(*) AS cr FROM tb GROUP BY 1),
         tgt AS (
           SELECT b, COUNT(*) AS ct FROM tb
           WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
           GROUP BY 1),
         tab AS (
           SELECT raw.b, cr, COALESCE(ct, 0) AS ct
           FROM raw LEFT JOIN tgt USING (b)),
         tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr,
                        CAST(SUM(ct) AS BIGINT) AS tt FROM tab),
         lr AS (
           SELECT b, CAST(ROUND(
               LN(CAST((ct + 1) * (tr + 1024) AS DOUBLE)
                  / CAST((cr + 1) * (tt + 1024) AS DOUBLE)) * 1000000.0)
             AS BIGINT) AS lr_micro
           FROM tab CROSS JOIN tot)
         SELECT tb.doc_id, COUNT(*) AS n_toks,
                CAST(SUM(lr.lr_micro) AS BIGINT) AS logw_micro
         FROM tb JOIN lr USING (b)
         GROUP BY 1 ORDER BY tb.doc_id""",

    "q113_nb_classifier" ->
      """WITH t AS (
           SELECT doc_id, lang AS label,
                  UNNEST(REGEXP_SPLIT_TO_ARRAY(text, '\s+')) AS tok
           FROM documents),
         tr AS (SELECT * FROM t WHERE doc_id % 10 != 0),
         ct AS (SELECT label, tok, COUNT(*) AS c FROM tr GROUP BY 1, 2),
         tt AS (SELECT label, CAST(SUM(c) AS BIGINT) AS tot FROM ct GROUP BY 1),
         vb AS (SELECT COUNT(DISTINCT tok) AS v FROM ct),
         td AS (SELECT lang AS label, COUNT(*) AS nd FROM documents
                WHERE doc_id % 10 != 0 GROUP BY 1),
         pr AS (
           SELECT label, CAST(ROUND(
               LN(CAST(nd AS DOUBLE)
                  / CAST(CAST((SELECT SUM(nd) FROM td) AS BIGINT) AS DOUBLE))
               * 1000000.0) AS BIGINT) AS prior_micro
           FROM td),
         lp AS (
           SELECT ct.label, ct.tok, CAST(ROUND(
               LN(CAST(c + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE))
               * 1000000.0) AS BIGINT) AS lp_micro
           FROM ct JOIN tt USING (label) CROSS JOIN vb),
         dfl AS (
           SELECT label, CAST(ROUND(
               LN(1.0 / CAST(tot + v AS DOUBLE)) * 1000000.0) AS BIGINT)
             AS dflt_micro
           FROM tt CROSS JOIN vb),
         te AS (SELECT doc_id, label AS label_true, tok FROM t
                WHERE doc_id % 10 = 0),
         sc AS (
           SELECT te.doc_id, te.label_true, d.label,
                  CAST(SUM(COALESCE(lp.lp_micro, d.dflt_micro)) AS BIGINT)
                    AS like_micro
           FROM te CROSS JOIN dfl d
           LEFT JOIN lp ON lp.label = d.label AND lp.tok = te.tok
           GROUP BY 1, 2, 3),
         fin AS (
           SELECT sc.doc_id, sc.label_true, sc.label,
                  pr.prior_micro + sc.like_micro AS score_micro
           FROM sc JOIN pr ON pr.label = sc.label),
         am AS (
           SELECT *, ROW_NUMBER() OVER
             (PARTITION BY doc_id ORDER BY score_micro DESC, label) AS r
           FROM fin)
         SELECT label_true, label AS label_pred, COUNT(*) AS n
         FROM am WHERE r = 1 GROUP BY 1, 2 ORDER BY 1, 2""")
}
