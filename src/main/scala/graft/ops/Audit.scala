package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-surface audit builders: fold an operator's output together with an
  * independent in-Spark baseline into DuckDB-assertable verdict rows —
  * the round-5 pattern that turned the rows-only surfaces into real
  * CORRECTNESS verdicts. The baseline side of each audit is itself
  * driver-oracled elsewhere (e.g. the brute-force top-k behind
  * [[annRecallAudit]] is q14's oracled surface), so the chain of trust
  * is: oracle proves the baseline, the audit proves the operator against
  * the baseline. */
object Audit {

  /** Per-query ANN serving audit vs the exact brute-force baseline.
    *
    * Emits one row per query: (query_id, k, n_ok, recall_ok, rerank_ok):
    *  - n_ok: the index returned exactly k results;
    *  - recall_ok: |approx ∩ exact top-k| * 100 >= recallBarPct * k —
    *    the bar is the measured per-query floor for the op on the verify
    *    corpora (deterministic data + seeds, so this is a regression
    *    pin, not a flake gate);
    *  - rerank_ok: every reported cosine equals the exact recompute
    *    (round 6) — proves the serving path reranks with true scores,
    *    not ADC/bucket approximations.
    *
    * Scale shape: the audit joins are all query-side (5..1000s of rows);
    * the only corpus-sized input is `embeddings`, touched once per side
    * by hash equi-joins on vec_id. */
  def annRecallAudit(
      approx: DataFrame,
      exact: DataFrame,
      embeddings: DataFrame,
      k: Int,
      recallBarPct: Int): DataFrame = {
    val a = approx.select(col("query_id").cast("long").as("query_id"),
      col("neighbor_id").cast("long").as("neighbor_id"),
      col("cosine").as("a_cos"))
    val e = exact.select(col("query_id").cast("long").as("query_id"),
      col("neighbor_id").cast("long").as("neighbor_id"))
    val hits = a.join(e, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    val emb = embeddings.select(col("vec_id"), col("embedding"))
      .withColumn("sd", SimSearch.dotCol(col("embedding"), col("embedding")))
    val qe = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), col("sd").as("qd"))
    val ne = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), col("sd").as("nd"))
    val parity = a.join(qe, "query_id").join(ne, "neighbor_id")
      .withColumn("ec",
        round(SimSearch.cosineWithNorms(col("qe"), col("ne"), col("qd"), col("nd")), 6))
      .groupBy(col("query_id")).agg(
        count(lit(1)).as("n_results"),
        // 2e-6 admits ONE 6th-decimal rounding-step divergence: q49/q54
        // score in a Float-rotated basis (~1e-7 cosine error vs the
        // original basis this recompute uses), which can flip a value
        // sitting on a 5e-7 rounding boundary; ADC/bucket approximations
        // the gate exists to catch are 1e-2-class
        expr("bool_and(abs(a_cos - ec) < 2e-6)").as("rerank_ok"))
    parity.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), lit(k.toLong).as("k"),
        (col("n_results") === k).as("n_ok"),
        (coalesce(col("n_hits"), lit(0L)) * 100 >= lit(recallBarPct.toLong * k))
          .as("recall_ok"),
        col("rerank_ok"))
  }
}
