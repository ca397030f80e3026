package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over EVERY registered query: the structural mistakes that
  * are invisible at test scale but fatal at 100 TB — an accidental
  * cartesian product or an unintended broadcast-nested-loop join (the
  * planner's fallback when an equi-condition got lost) must never appear.
  * Queries whose ALGORITHM is a deliberate broadcast cross product
  * (brute-force similarity scoring against a broadcast query set) are
  * explicitly whitelisted with the reason.
  */
class PlanLintSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Deliberate cross products: a tiny broadcast side scored against
    * every corpus row IS the brute-force baseline.
    */
  private val crossProductIntended: Set[String] = Set(
    "q24_cosine_topk",       // brute-force cosine: corpus × broadcast queries
    "q33_embedding_neardup", // all-pairs within-corpus cosine (threshold join)
    "q82_semdedup_survivors", // exact SemDeDup: all-pairs cosine edges feed
                              // the components closure (recall yardstick for
                              // the IVF-blocked variant)
    "q37_corpus_overlap",    // source-pair sketch compare: rows = #sources²,
                             // independent of corpus size (group aggregates)
    "q101_bm25_topk",        // ONE-ROW corpus stats (N, avgdl) broadcast
                             // against the per-doc scores — a scalar
                             // attach, not a combinatorial product
    "q104_hybrid_rrf",       // same ONE-ROW stats attach inside its BM25 leg
    "q132_hybrid_rrf_topk",  // same ONE-ROW stats attach (shared scoring
                             // prefix with q104; the truncation changes
                             // only the ranking machinery above it)
    "q123_pq_adc",           // PQ ADC scan: corpus codes × broadcast query
                             // LUTs — the compressed-domain analogue of
                             // q24's broadcast brute force
    "q135_dsir_select",      // ONE-ROW corpus totals (target/raw feature
                             // counts) broadcast against the B-row bucket
                             // histogram — a scalar attach, not a
                             // combinatorial product
    "q138_kn_lm_score",      // ONE-ROW (T, n1, n2) discount totals
                             // broadcast against the bigram-TYPE table —
                             // the same scalar attach as q135
    "q140_ccnet_lm_filter",  // the q138 attach plus a ONE-ROW corpus
                             // count for the integer 30/40/30 cuts
    "q129_triangle_approx",  // final ONE-ROW × ONE-ROW attach of the exact
                             // yardstick to the sampled estimate — two
                             // scalar aggregates, bounded by construction
    "q148_shard_assign",     // ONE-ROW global sequence count broadcast
                             // against the ranked frame — the q135/q138
                             // scalar attach, bounded by construction
    "q141_exact_decontam",   // exact decontamination yardstick: corpus ×
                             // broadcast EVAL SET cosine (the q24/q82
                             // brute-force shape; q139 is the scale path)
    "q150_curation_pipeline", // fused lineage ends in q148's ONE-ROW
                             // global-count broadcast attach — the same
                             // bounded-by-construction scalar, nothing
                             // combinatorial anywhere in the chain
    "q152_shard_tokens",     // token-balanced shards: the SAME ONE-ROW
                             // total-token broadcast attach
                             // (Sharding.tokenBalancedShards)
    "q153_curation_tokens"   // q150's fused lineage with q152's cut —
                             // the same two bounded 1-row attaches
  )

  test("column pruning reaches the parquet scans (spot checks)") {
    def scanWidths(name: String): Seq[Int] =
      "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(
          SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        .map(_.group(1).count(_ == ':')).toSeq
    // q01 needs 5 of lineitem's 11 columns; a full-width scan means
    // pruning broke somewhere between the plan and the source
    assert(scanWidths("q01_agg_rollup").exists(_ == 5))
    assert(scanWidths("q73_date_math").forall(_ <= 2))  // 2 of orders' 6
    assert(scanWidths("q68_regex_extract").forall(_ <= 3)) // 3 of documents' 5
  }

  test("no accidental CartesianProduct / BroadcastNestedLoopJoin in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan.toString
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad && !crossProductIntended(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"unintended cross products in: $offenders")
  }
}
