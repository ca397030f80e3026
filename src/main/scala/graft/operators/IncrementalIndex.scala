package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance for the retrieval index family (q101 BM25,
  * q102 inverted index) — the q115 IVM-merge contract applied to
  * postings: a corpus APPEND is folded into the stored index by merging
  * token-level states, never by re-scanning the corpus.
  *
  * State shapes (both map-side-combinable, both vocabulary/corpus-count
  * sized, orders of magnitude smaller than the text they summarize):
  *  - token state: `(token, df, total_tf, posts: Array[(doc_id, tf)])`
  *    — one corpus-slice pass builds it; [[merge]] unions states and
  *    re-aggregates per token (sum counts, concat+sort postings). For
  *    an append-only corpus the doc sets of the states are disjoint, so
  *    merge(state(A), state(B)) ≡ state(A ∪ B) by associativity of
  *    count/sum/list-union — the exact argument q115 makes for its
  *    signed rollup, proven as postings-string equality in
  *    `IncrementalIndexSpec` and by the q128 oracle.
  *  - doc state: `(doc_id, dl)` — document lengths, the only per-doc
  *    fact BM25 needs; append-only union, no aggregation to maintain.
  *
  * Merge cost is INDEX-sized (the stored state + the batch's state meet
  * in one vocabulary-keyed shuffle); ingesting 1 TB into a 100 TB
  * corpus tokenizes 1 TB and re-aggregates the touched tokens — the
  * same "shuffle the delta, not the corpus" shape as q99/q127. In
  * production the stored state is a bucketed table keyed by token, so
  * the merge co-locates; here it round-trips through parquet in the
  * streamed spec (`foreachBatch` appends one partial state per
  * micro-batch; reading them back IS a merge).
  */
object IncrementalIndex {

  /** Token-level index state of a corpus slice (`doc_id`, `text`). */
  def state(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("posts"))

  /** Per-document length state (for BM25's dl / avgdl / n_docs). */
  def docState(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))

  /** Merge token states of DISJOINT corpus slices (an append): one
    * vocabulary-keyed aggregation over the states themselves.
    */
  def merge(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("token"))
      .agg(
        sum(col("df")).as("df"),
        sum(col("total_tf")).as("total_tf"),
        sort_array(flatten(collect_list(col("posts")))).as("posts"))

  /** Retract documents from a token state — the other half of the q115
    * signed contract (inserts +1 / retractions −1): takedowns, opt-outs,
    * and re-crawl replacements are deletes against a 100 TB index that
    * must never trigger a rebuild. The deleted docs are re-tokenized
    * (delete-by-content, the only information the index itself holds),
    * their postings negated, and the merge re-aggregates at the
    * (token, doc) level: live tf ≤ 0 vanishes — exactly q115's "groups
    * whose live count reaches zero disappear" argument, so
    * applyDeletes(state(A ∪ B), B) ≡ state(A), proven in the spec.
    * Cost: the delete batch's tokenization + one index-sized re-agg of
    * the TOUCHED tokens' postings; the corpus is never read.
    */
  def applyDeletes(tokenState: DataFrame, deletedDocs: DataFrame): DataFrame = {
    val negated = state(deletedDocs)
      .select(col("token"), transform(col("posts"),
        p => struct(p("doc_id").as("doc_id"), (-p("tf")).as("tf"))).as("posts"))
    tokenState.select(col("token"), col("posts")).unionByName(negated)
      .select(col("token"), explode(col("posts")).as("p"))
      .groupBy(col("token"), col("p.doc_id").as("doc_id"))
      .agg(sum(col("p.tf")).as("tf"))
      .filter(col("tf") > 0)
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("posts"))
  }

  /** q102's output shape: the posting list rendered `docid:tf,...`. */
  def render(state: DataFrame): DataFrame =
    state.select(
      col("token"), col("df"), col("total_tf"),
      array_join(
        transform(col("posts"), e => concat_ws(":", e("doc_id"), e("tf"))),
        ",").as("postings"))

  /** BM25 top-k served from MAINTAINED state instead of the corpus:
    * takes the merged token state + merged doc state and reproduces
    * q101's scoring exactly (same constants, same rounding, same
    * rank-on-rounded discipline). The corpus text is never touched —
    * the query cost is |terms| posting lists + the doc-length table.
    */
  def bm25FromState(
      tokenState: DataFrame,
      docState: DataFrame,
      terms: Seq[String],
      k: Int): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    def r6(c: Column): Column = floor(c * 1000000 + lit(0.50001)) / 1000000
    val stats = docState.agg(
      count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = tokenState
      .filter(col("token").isin(terms: _*))
      .select(col("token"), col("df"), explode(col("posts")).as("p"))
      .select(col("token"), col("df"),
        col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    val scored = tf
      .join(docState, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1)))
      .withColumn("part",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(r6(sum(col("part"))).as("bm25"))
    Ranking.topK(scored, k, Seq(col("bm25").desc, col("doc_id")), "rank")
      .select(col("doc_id"), col("bm25"), col("rank"))
  }
}
