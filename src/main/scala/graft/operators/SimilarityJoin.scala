package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT all-pairs set-similarity join via prefix filtering (the
  * AllPairs/PPJoin family — Bayardo et al. 2007 "Scaling Up All Pairs
  * Similarity Search"; Xiao et al. 2008). Unlike MinHash LSH
  * ([[Dedup.minHashCandidates]]) this has NO false negatives: every pair
  * with Jaccard ≥ τ is emitted, so it is DuckDB-oracle-checkable against
  * the brute-force cross join and doubles as the recall yardstick for
  * the sketch-based paths.
  *
  * Prefix-filter principle: order each document's shingle set by one
  * global ordering (rarest shingle first); if two sets have Jaccard ≥ τ
  * they MUST share at least one shingle within each other's first
  * |d| − ⌈τ·|d|⌉ + 1 shingles. So an equi-join on prefix shingles
  * generates a complete (and small — prefixes hold the RAREST shingles)
  * candidate set, verified exactly afterwards.
  *
  * Scale design (100 TB): three shuffles — shingle document frequency
  * (tiny rows), the prefix equi-join (bucket sizes bounded by shingle
  * rarity: a shingle shared by many documents is by construction deep in
  * their orderings, hence rarely in a prefix), and the verify join (only
  * candidate pairs move full shingle arrays). The length filter
  * τ·|a| ≤ |b| prunes before any intersection. No cross product at any
  * stage.
  */
object SimilarityJoin {

  /** All pairs (a_id < b_id) of documents whose distinct word-`n`-gram
    * shingle sets have Jaccard ≥ `tau`. Output: a_id, b_id, jaccard.
    */
  def jaccardJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tau: Double,
      shingleWords: Int = 5): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = Spread.ensure(docs.select(col(idCol), col(textCol)),
      // PPJoin's per-row prefix kernel (word shingles + sort + slice) is
      // the q37 density class; r16 isolated A/B at sf0.1 (19 KB/core,
      // previously pass-through): q58 0.97–1.01 → 0.83–0.85 s across two
      // interleaved 5/7-run pairs with a q110 host-speed control
      computeWeight = 10.0)
      .select(
        col(idCol).as("__id"),
        QualityRules.wordShingles(col(textCol), shingleWords).as("__sh"))
      .filter(size(col("__sh")) > 0)

    // Everything downstream runs on 64-bit shingle hashes, not strings:
    // smaller shuffles, long-typed sorts and intersections. Correctness
    // is unaffected — prefix filtering is complete under ANY consistent
    // global shingle order, and hash-set Jaccard equals string-set
    // Jaccard absent 64-bit collisions (~2e-9 at 1e5 distinct shingles).
    val exploded = base
      .select(col("__id"), explode(col("__sh")).as("__s0"))
      .select(col("__id"), xxhash64(col("__s0")).as("__s"))
    // Global shingle order: document frequency asc, hash asc. No dense
    // global rank is materialized — (df, hash) pairs order lexically.
    // df via a count window, not groupBy+join-back: one shuffle of the
    // corpus-sized exploded table instead of two.
    val wS = org.apache.spark.sql.expressions.Window.partitionBy("__s")
    val ordered = exploded
      .withColumn("__df", count(lit(1)).over(wS))
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__s")))).as("__ord"))
      .select(
        col("__id"),
        transform(col("__ord"), e => e.getField("__s")).as("__sh"),
        size(col("__ord")).as("__len"))
      .withColumn(
        "__p",
        (col("__len") - ceil(lit(tau) * col("__len")) + 1).cast("int"))
      .withColumn("__prefix", slice(col("__sh"), lit(1), col("__p")))
      .localCheckpoint(true) // reused by candidates AND both verify sides
      // (cache() was measured slower here: columnar encode/decode of the
      // long-array columns costs more than it saves)

    val pfx = ordered.select(col("__id"), explode(col("__prefix")).as("__s"))
    val candidates = pfx.as("a")
      .join(pfx.as("b"), col("a.__s") === col("b.__s") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
      .distinct()

    val aSide = ordered.select(
      col("__id").as("a_id"), col("__sh").as("__sha"), col("__len").as("__la"))
    val bSide = ordered.select(
      col("__id").as("b_id"), col("__sh").as("__shb"), col("__len").as("__lb"))
    val inter = size(array_intersect(col("__sha"), col("__shb")))
    candidates
      .join(aSide, "a_id")
      .join(bSide, "b_id")
      // length filter: Jaccard ≥ τ needs τ·max(|a|,|b|) ≤ min(|a|,|b|)
      .filter(
        least(col("__la"), col("__lb")).cast("double") >=
          lit(tau) * greatest(col("__la"), col("__lb")))
      .withColumn(
        "jaccard",
        inter.cast("double") / (col("__la") + col("__lb") - inter))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
