package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling beyond uniform hash gates ([[Splits]]):
  * weighted priority sampling and per-group quota caps — the corpus
  * rebalancing moves of a training-data pipeline.
  *
  * Scale design (100 TB): the weighted sample is the Efraimidis–Spirakis
  * A-ES scheme (key = ln(u)/w, take the k largest), with u derived from
  * md5(id) instead of a PRNG — so the sample is a pure function of the
  * data, reproducible across runs, engines, and partitionings. Selecting
  * the top-k is a TakeOrdered (per-partition heap + driver merge of k·P
  * rows), never a global sort. Group caps are one window per group —
  * a single hash shuffle on the group key.
  */
object Sampling {

  /** Deterministic uniform in (0, 1]: the first 15 hex digits of md5(id)
    * scaled by 16^15 (both exactly representable in a double/long — any
    * engine with md5 recomputes the identical value; DuckDB oracles do).
    */
  def md5Uniform(id: Column): Column =
    // +1 in INTEGER space (an engine converting to double first would
    // no-op the +1 above 2^53), then one int64→double rounding — every
    // engine rounds identically.
    (conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") + lit(1L))
      .cast("double") / lit(1152921504606846976.0) // 16^15

  /** Efraimidis–Spirakis priority: ln(u)/w, monotone in u^(1/w). Higher
    * weight ⇒ key closer to 0 ⇒ more likely in the top-k.
    */
  def priorityKey(id: Column, weight: Column): Column =
    log(md5Uniform(id)) / weight

  /** Weighted sample WITHOUT replacement of k rows: P(i in sample) is
    * the A-ES weighted-reservoir probability for weight `weightCol`.
    * Deterministic (hash-derived randomness, id tiebreak). The priority
    * key itself is dropped from the output so no float crosses the API.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // A-ES is defined for positive weights; a negative weight would flip
    // ln(u)/w positive and win the sample. Non-positive-weight rows are
    // unsampleable (P = 0) and are dropped rather than silently promoted.
    val keyed = df
      .filter(col(weightCol) > 0)
      .withColumn("__pri", priorityKey(col(idCol), col(weightCol)))
    keyed
      .orderBy(col("__pri").desc, col(idCol).asc)
      .limit(k)
      .drop("__pri")
  }

  /** Deterministic rebalance to group parity: downsample every group to
    * (approximately) the size of the SMALLEST group — the "balance the
    * language/domain mix" move. Each row passes iff
    * md5Uniform(id) ≤ min_count / count(its group); the gate is a pure
    * function of the id, so membership is stable across runs and
    * subsets. Expected kept size per group = min_count.
    *
    * Scale design: one map-side-combinable count agg (groups are few —
    * broadcast back), then a scan-parallel hash gate; no data shuffle
    * at all for the gating pass.
    */
  def balanceGroups(df: DataFrame, idCol: String, groupCols: Seq[String]): DataFrame = {
    // one count pass: the group-cardinality-sized table is checkpointed,
    // so the min probe and the broadcast join both read the materialized
    // result instead of re-aggregating the input
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val minRow = counts.agg(min(col("__n"))).first()
    if (minRow.isNullAt(0)) return df // empty input: nothing to rebalance
    val minN = minRow.getLong(0)
    df.join(broadcast(counts), groupCols)
      .filter(md5Uniform(col(idCol)) <= lit(minN.toDouble) / col("__n"))
      .select(df.columns.map(col): _*) // joins put keys first; restore input order
  }

  /** Deterministic mixture sampling to an EXPLICIT target distribution
    * (the "domain mixing weights" move: e.g. 50% web, 30% code, 20%
    * papers). The achievable corpus size is N* = min over targeted
    * groups of count_g / t_g (the scarcest group is used whole); each
    * group keeps rate_g = N*·t_g / count_g of its rows via the md5 hash
    * gate. Groups absent from `targets` are dropped. Expected kept size
    * of group g = N*·t_g — the requested mix at the largest size the
    * data supports.
    *
    * Scale design: identical shape to [[balanceGroups]] — one count agg
    * (group-cardinality-sized, collected for the scalar N*), then a
    * shuffle-free scan-parallel gate against broadcast rates.
    */
  def mixToTarget(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive weights")
    val tot = targets.values.sum
    val norm = targets.map { case (g, w) => (g, w / tot) }
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .filter(col(groupCol).isin(norm.keys.toSeq: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .as[(String, Long)].collect().toMap
    if (counts.isEmpty) return df.limit(0)
    // groups targeted but absent contribute nothing and cap nothing
    val nStar = counts.map { case (g, n) => n / norm(g) }.min
    val rates = counts.toSeq
      .map { case (g, n) => (g, math.min(1.0, nStar * norm(g) / n)) }
      .toDF(groupCol, "__rate")
    df.join(broadcast(rates), Seq(groupCol))
      .filter(md5Uniform(col(idCol)) <= col("__rate"))
      .select(df.columns.map(col): _*)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by the log importance ratio of a hashed-ngram bag-of-words model
    * of the TARGET domain vs the RAW corpus, then Gumbel-top-k sample —
    * the "pick web pages that look like Wikipedia" move.
    *
    * Model: word uni+bigrams hashed into `buckets` buckets; per-bucket
    * add-1-smoothed multinomials p_target / p_raw estimated from the
    * corpus itself (`isTarget` marks the target rows); per-doc
    * log-ratio = Σ_occurrences log(p_t(b)/p_r(b)). Selection follows
    * the paper's sampled (not argmax) variant via Gumbel perturbation,
    * with all randomness md5-derived so the sample is a pure function
    * of the data.
    *
    * Determinism: per-BUCKET log-ratios are quantized once to 1e-6
    * fixed-point LONGs (B values), so every per-doc score is an
    * integer sum — associative under any partial-agg schedule (the
    * same order-independence rule the money sums follow; a double sum
    * here would flip low bits with partitioning). Gumbel noise is
    * likewise one quantized LONG per doc.
    *
    * Scale design (100 TB): two scan-parallel corpus passes — (1) the
    * histogram, a map-side-combinable agg onto `buckets` keys whose
    * result is broadcast back; (2) the per-doc score, one shuffle on
    * the doc id with integer partial aggregation. Selection is a
    * TakeOrdered heap, never a global sort. Nothing is all-pairs; the
    * only driver-side object is the B-row histogram (broadcast).
    */
  def dsirSelect(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      k: Int = 100): DataFrame = {
    require(buckets > 0 && k > 0, "buckets and k must be positive")
    val base = docs.select(col(idCol), col(textCol).as("__txt"), isTarget.as("__t"))
    // per-occurrence uni+bigram features, hashed to a bucket id
    val feats = base.select(
      col(idCol), col("__t"),
      explode(concat(
        QualityRules.wordNGramsAll(col("__txt"), 1),
        QualityRules.wordNGramsAll(col("__txt"), 2))).as("__f"))
      .select(
        col(idCol), col("__t"),
        (conv(substring(md5(col("__f")), 1, 7), 16, 10).cast("long")
          % buckets).as("__b"))
    // add-1-smoothed per-bucket log ratio, quantized to 1e-6 LONG once
    val hist = feats.groupBy(col("__b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
      count(lit(1)).as("__rc"))
    val tot = hist.agg(
      sum(col("__tc")).as("__tt"), sum(col("__rc")).as("__rr"))
    val qlr = hist.crossJoin(broadcast(tot)).select(
      col("__b"),
      floor(
        (log((col("__tc") + 1.0) / (col("__tt") + buckets.toDouble))
          - log((col("__rc") + 1.0) / (col("__rr") + buckets.toDouble)))
          * 1000000 + lit(0.50001)).cast("long").as("__qlr"))
    val scores = feats
      .join(broadcast(qlr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__qlr")).as("logratio_fp"))
    // Gumbel(0,1) = -ln(-ln(u)); u clamped below 1 so the outer ln
    // never sees 0 (u = 1 is the all-F md5 prefix — astronomically
    // rare but defined)
    val u = least(md5Uniform(col(idCol)), lit(0.999999999999999))
    docs.select(col(idCol))
      .join(scores, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("logratio_fp"), lit(0L)).as("logratio_fp"),
        (coalesce(col("logratio_fp"), lit(0L))
          + floor(-log(-log(u)) * 1000000 + lit(0.50001)).cast("long"))
          .as("sel_fp"))
      .orderBy(col("sel_fp").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-group quota: keep the top `n` rows of each group under
    * `orderCols` (must be a deterministic total order), with the rank
    * appended — "cap every domain/language at N documents".
    */
  def capPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      n: Int,
      rankCol: String = "rk"): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Temperature-balanced mixture WITH REPETITION — the multilingual
    * `p^α` sampling move (Conneau & Lample 2019 §3.1; also the
    * domain-mixing step of most LLM data recipes): reshape the corpus so
    * group g's share of the output is `n_g^α / Σ n_h^α` while keeping
    * the total document budget at N. Unlike [[mixToTarget]] (pure
    * downsample to exact proportions), low-resource groups are
    * UPSAMPLED by fractional repetition: every document of group g gets
    * `floor(r_g)` copies plus one more iff `md5Uniform(id) < frac(r_g)`
    * where `r_g = N·share_g / n_g` — so the expected group sizes hit the
    * temperature shares exactly, repetition is spread evenly over the
    * group (never "the same doc N times while its sibling appears
    * once"), and the output is a pure function of the data: no RNG
    * state, reproducible across runs, engines, and partitionings.
    *
    * Cross-engine determinism discipline: `r_g` is grid-rounded to 1e-6
    * (the repo's `floor(x·1e6 + 0.50001)/1e6` helper) so an oracle
    * recomputing it from the same counts — sqrt/pow and a few-term sum,
    * each within ulps across engines — lands on the SAME double; `base`
    * and `frac` then derive from that identical value, and the md5 gate
    * compares identical doubles on both sides.
    *
    * Scale design: one combinable count per group (collected —
    * #groups-bounded, the [[mixToTarget]] pattern), rates broadcast
    * back, copies materialized by `explode(sequence(1, n_copies))` —
    * a pure scan-shaped pass, no corpus shuffle; `n_copies` is bounded
    * by `ceil(max r_g)`, itself bounded by N/n_min at α=0 and 1 at α=1.
    *
    * Group-key typing: counts collect as raw `Row`s and the rate frame
    * is rebuilt under the INPUT's own group-column type (r13 ADVICE —
    * the old `.as[(String, Long)]` cast failed at runtime for any
    * non-string group key, an int language id being the obvious one).
    * NULL group keys are rejected up front with a loud `require`: a
    * null would silently vanish in the rate equi-join, which is a data
    * bug to surface, not a row to drop.
    *
    * @param alpha temperature in [0, 1]: 1 = natural proportions
    *              (every r_g = 1), 0 = uniform across groups
    * @param copyCol appended 1-based copy index (1 = the original)
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      alpha: Double = 0.5,
      copyCol: String = "copy"): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.50001) / 1e6
    val spark = df.sparkSession
    // native-typed group keys, deterministic sum order via string render
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.get(0), r.getLong(1)))
      .sortBy { case (g, _) => String.valueOf(g) }
    require(counts.forall(_._1 != null),
      s"temperatureMix: null $groupCol key — a null group would " +
        "silently drop in the rate join; clean or coalesce it upstream")
    if (counts.isEmpty) return df.withColumn(copyCol, lit(1L)).limit(0)
    val total = counts.map(_._2).sum
    val wSum = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val gField = df.schema(df.schema.fieldIndex(groupCol))
    val rateSchema = org.apache.spark.sql.types.StructType(Seq(
      gField.copy(name = groupCol),
      org.apache.spark.sql.types.StructField(
        "__base", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "__frac", org.apache.spark.sql.types.DoubleType, nullable = false)))
    val rateRows = counts.toSeq.map { case (g, n) =>
      val r = r6d(total * math.pow(n.toDouble, alpha) / (wSum * n))
      org.apache.spark.sql.Row(g, math.floor(r).toLong, r - math.floor(r))
    }
    val rates = spark.createDataFrame(
      spark.sparkContext.parallelize(rateRows, 1), rateSchema)
    df.join(broadcast(rates), Seq(groupCol))
      .withColumn("__copies",
        col("__base") +
          when(md5Uniform(col(idCol)) < col("__frac"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .select(
        (df.columns.map(col) :+
          explode(sequence(lit(1L), col("__copies"))).as(copyCol)): _*)
  }
}
