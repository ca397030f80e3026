package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for nearest-neighbor search (Jégou, Douze &
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011) — the memory-compression half of a FAISS-style IVF-PQ index,
  * complementing the IVF coarse quantizer in [[Similarity.ivfCosineTopK]].
  *
  * A `dim`-dimensional vector is split into `m` contiguous subspaces of
  * `dim/m` components; each subspace is quantized independently against a
  * `ks`-entry codebook, so a vector stores as `m` small codes (q123's
  * `m=16, ks=64` → 16 codes of 6 bits = 96 bits per 64-dim vector, a 21×
  * compression over float32). Search uses the *asymmetric distance
  * computation* (ADC) of the paper's §III: the query stays unquantized,
  * a per-query lookup table of `m × ks` subspace distances is built once,
  * and each corpus vector's distance estimate is `m` table lookups — no
  * float math per candidate.
  *
  * Codebook training here is **deterministic anchor sampling**, not
  * Lloyd's: code `c`'s centroid is the corpus vector with the smallest
  * `md5(id)` inside md5-bucket `c` (the repo's standard cross-engine
  * gate, cf. [[Splits]]). That is the "init by sampled points" step of
  * k-means without the iterations — quantization is coarser than a
  * converged codebook, but every step is exactly replayable in ANSI SQL,
  * so the full encode→ADC→top-k pipeline is hash-checked against DuckDB
  * (q123) rather than spec-only like the Lloyd's-trained paths (q32/q94).
  *
  * Scale shape (the point of PQ at 100 TB):
  *  - training: ONE hash shuffle (`groupBy(bucket).min_by`) over the
  *    corpus, `ks` rows collected — bounded by construction;
  *  - encoding: a pure map pass against the broadcast codebook literal
  *    (no join, no shuffle); the encoded corpus is `m` ints per row, the
  *    only thing the search scan ever reads;
  *  - search: broadcast the (tiny) query side with per-query LUTs
  *    attached, one codegen'd map over the codes, one per-query top-k.
  *  In production the ADC scan runs inside IVF cells (probe a few cells,
  *  not the corpus); the flat scan here is the composable kernel.
  */
object ProductQuantizer {

  /** (code, centroid) pairs, ascending by code; codes may be sparse if an
    * md5 bucket is empty (both engines then derive the same sparse set).
    */
  type Codebook = Seq[(Long, Seq[Double])]

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Deterministic md5-anchor codebook: one shuffle, ≤ `ks` rows out. */
  def trainCodebook(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      ks: Int = 16): Codebook = {
    val h = md5(col(idCol).cast("string"))
    val bucket = conv(substring(h, 1, 4), 16, 10).cast("long") % ks
    corpus
      .select(bucket.as("__c"), h.as("__h"), toDouble(col(vecCol)).as("__v"))
      .groupBy("__c")
      .agg(min_by(col("__v"), col("__h")).as("__cv"))
      .orderBy("__c")
      .collect() // ≤ ks rows — bounded by construction
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
  }

  /** Encode every vector to `m` centroid positions (argmin squared L2
    * per subspace, first-wins ties) — a shuffle-free map pass through the
    * native [[graft.functions.PqCodes]] expression; the codebook ships in
    * the plan as a reference object.
    */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      codebook: Codebook,
      m: Int): DataFrame =
    corpus.select(
      col(idCol),
      graft.functions.PqCodes.toCol(
        toDouble(col(vecCol)), codebook.map(_._2), m).as("codes"))

  private val r6 = (c: Column) => floor(c * 1000000 + lit(0.50001)) / 1000000

  /** Flat ADC top-k: encode the corpus, build each query's `m × ks` LUT,
    * estimate distances by LUT lookups, keep the `k` best per query.
    *
    * Output: (query_id, neighbor_id, adc, rank) — `adc` rounded to 1e-6
    * BEFORE ranking so cross-engine float noise cannot reorder ranks.
    */
  def adcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      ks: Int = 16): DataFrame = {
    val codebook = trainCodebook(corpus, idCol, vecCol, ks)
    val coded = encode(corpus, idCol, vecCol, codebook, m)

    // lut[j+1][p+1] = squared subspace-j distance from this query to
    // centroid position p — computed once per query, broadcast with it.
    val lut = graft.functions.PqLut.toCol(
      toDouble(col(vecCol)), codebook.map(_._2), m)
    val q = queries.select(col(idCol).as("query_id"), lut.as("__lut"))

    val adc = graft.functions.PqAdc.toCol(col("__lut"), col("codes"))

    val scored = coded
      .crossJoin(broadcast(q))
      .where(col(idCol) =!= col("query_id"))
      .select(
        col("query_id"),
        col(idCol).as("neighbor_id"),
        r6(adc).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** ADC-shortlist + exact re-rank — the production search shape (FAISS's
    * default): the compressed-domain scan keeps a `shortlist`-deep
    * candidate set per query (cheap: `m` table lookups per corpus row),
    * then only those candidates are re-scored against their FULL vectors
    * and the true `k` best are kept. Recall is then "probability the true
    * neighbors survive the shortlist" — at sf0.01 with the defaults
    * (m=16, ks=64, shortlist=50) that is 0.92 of the exact L2 top-5,
    * pinned in `ProductQuantizerSpec`.
    *
    * Scale shape: the shortlist is Q×shortlist ids — broadcast it back
    * over the corpus scan to fetch candidate vectors (one map-side hash
    * join, no shuffle of the corpus), attach the Q query vectors the same
    * way, re-rank `k` of `shortlist` per query.
    *
    * Output: (query_id, neighbor_id, l2, rank) — `l2` is the exact
    * squared distance rounded to 1e-6 before ranking.
    */
  def adcRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 16,
      ks: Int = 64,
      shortlist: Int = 50): DataFrame = {
    val short = adcTopK(corpus, queries, idCol, vecCol, shortlist, m, ks)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(corpus, queries, short, idCol, vecCol, k)
  }

  /** Exact full-vector re-rank of a (query_id, neighbor_id) shortlist:
    * candidate vectors fetched by one broadcast hash join over the corpus
    * scan, query vectors attached the same way, squared L2 rounded to
    * 1e-6 before the per-query rank.
    */
  private def exactRerank(
      corpus: DataFrame,
      queries: DataFrame,
      short: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val qv = queries.select(
      col(idCol).as("query_id"), toDouble(col(vecCol)).as("__qv"))
    val cand = corpus
      .select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("__nv"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
    val l2 = aggregate(
      sequence(lit(1), size(col("__nv"))),
      lit(0.0),
      (s, i) => {
        val d = element_at(col("__qv"), i.cast("int")) -
          element_at(col("__nv"), i.cast("int"))
        s + d * d
      })
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("l2").asc, col("neighbor_id").asc)
    cand
      .select(col("query_id"), col("neighbor_id"), r6(l2).as("l2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF-PQ: the full FAISS index shape (Jégou et al. §IV) with both
    * quantizers md5-anchor-trained, so the ENTIRE index — coarse cells,
    * residuals, fine codes, probe selection, in-cell ADC, re-rank — is
    * exactly replayable in SQL (q124's oracle).
    *
    *  - Coarse: `cells` anchors over the full vector partition the corpus;
    *    each vector stores its cell + the `m` fine codes of its RESIDUAL
    *    (vector − cell centroid), the paper's variance-killing trick.
    *  - Search: a query ranks cells by (1e-6-rounded) distance, probes the
    *    `nprobe` nearest, and carries one residual LUT per probed cell.
    *    The ADC scan is then an EQUI-join corpus.cell = probe.cell — the
    *    broadcast-cross-product of the flat scan becomes a selective hash
    *    join touching ~nprobe/cells of the corpus, which is the entire
    *    point of IVF at 100 TB.
    *  - Shortlist → exact re-rank as in [[adcRerankTopK]].
    *
    * Output: (query_id, neighbor_id, l2, rank), identical contract to
    * [[adcRerankTopK]] — only the candidate set (and thus recall) differs.
    *
    * `fineSampleMod`: the fine codebook trains on the deterministic
    * 1/`fineSampleMod` slice of the corpus whose md5(id) hex digits 5–8
    * are ≡ 0 (mod `fineSampleMod`) — the same cross-engine gate as the
    * bucket assignment, so the DuckDB oracle replays it exactly. This is
    * how PQ trains in production anyway (FAISS fits codebooks on a
    * sample); here it also removes what used to be a full-corpus
    * `localCheckpoint`: the training job scans only the gated slice, the
    * encode pass is then the residual frame's single consumer, and no
    * corpus-sized copy is ever materialized. Raise `fineSampleMod` with
    * corpus size (the anchors only need each md5 bucket populated).
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 4,
      m: Int = 16,
      ks: Int = 64,
      shortlist: Int = 50,
      fineSampleMod: Int = 2): DataFrame = {
    val coarse = trainCodebook(corpus, idCol, vecCol, cells)
    val cellOf = (v: Column) => element_at(
      graft.functions.PqCodes.toCol(v, coarse.map(_._2), 1), 1)
    val residOf = (v: Column, cell: Column) =>
      graft.functions.PqResidual.toCol(v, cell, coarse.map(_._2))

    val withCell = corpus.select(
      col(idCol), toDouble(col(vecCol)).as("__v"),
      cellOf(toDouble(col(vecCol))).as("cell"))
    val resid = withCell
      .withColumn("__rv", residOf(col("__v"), col("cell")))

    // fine codebook over RESIDUALS of the md5-gated sample, same
    // md5-anchor rule. The gate keeps the training scan (and the bounded
    // ≤ks collect behind it) proportional to the sample, not the corpus.
    val sampleGate =
      conv(substring(md5(col(idCol).cast("string")), 5, 4), 16, 10)
        .cast("long") % fineSampleMod === 0
    val fine = trainCodebook(resid.where(sampleGate), idCol, "__rv", ks)
    val coded = resid.select(
      col(idCol), col("cell"),
      graft.functions.PqCodes.toCol(col("__rv"), fine.map(_._2), m).as("codes"))

    // probe the nprobe nearest cells per query (rank on rounded distance)
    val cellDists = element_at(
      graft.functions.PqLut.toCol(toDouble(col(vecCol)), coarse.map(_._2), 1), 1)
    val qCells = queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("__qv"),
        posexplode(cellDists).as(Seq("__pos", "__d")))
      .select(col("query_id"), col("__qv"), col("__pos").as("cell"),
        r6(col("__d")).as("__dr"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__dr").asc, col("cell").asc)
    val probes = qCells
      .withColumn("__pr", row_number().over(pw))
      .where(col("__pr") <= nprobe)
      .select(col("query_id"), col("cell"),
        graft.functions.PqLut.toCol(
          residOf(col("__qv"), col("cell")), fine.map(_._2), m).as("__lut"))

    val adc = graft.functions.PqAdc.toCol(col("__lut"), col("codes"))
    val scored = coded
      .join(broadcast(probes), Seq("cell"))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), r6(adc).as("adc"))
    val sw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val short = scored
      .withColumn("rank", row_number().over(sw))
      .where(col("rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(corpus, queries, short, idCol, vecCol, k)
  }
}
