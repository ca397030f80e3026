package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused end-to-end curation lineage — the chain a 100 TB training
  * run actually executes as ONE job, not six: exact-substring duplicate
  * CUT → Gopher quality gate → benchmark decontamination → BPE encode
  * under the frozen tokenizer → concat-and-split sequence gather →
  * epoch-0 shard manifest. Every stage exists (and is oracle-checked)
  * in isolation as q134 / q51 / q139 / q142 / q144 / q148; what nothing
  * proved until this operator is that the INTERFACES compose: the cut
  * text re-enters [[Bpe.encode]]'s ≥ 1-word contract only through the
  * quality gate (the gate's 20-word floor is what guarantees it), gate
  * survivorship feeds [[Packing.tokenOffsets]]' total-order determinism
  * (offsets are a pure function of the surviving id set, so any
  * upstream row change reshuffles every downstream offset — exactly
  * what the composed oracle hash-checks), and the eager
  * localCheckpoints of three stacked two-consumer stages
  * (tokenOffsets inside the gather, the gathered frame itself, the
  * rank) coexist in one lineage without re-executing each other.
  *
  * Scale shape = the sum of its parts, each already audited: ONE digest
  * shuffle for the cut, per-row codegen'd gate signals, an
  * IVF-cell-blocked equi-join for the decontamination (never
  * eval × corpus), the dictionary-join encode, one linear fragment
  * shuffle for the gather, and the two-pass distributed rank with a
  * 1-row broadcast total. Fusing adds NO new shuffle: stage boundaries
  * are narrow projections/filters, so the fused job is strictly
  * cheaper than running the six stages as separate corpus-rereading
  * jobs (each stage re-reads its predecessor's in-flight frame, not
  * the source parquet).
  */
object CurationPipeline {

  /** Curate `docs` end to end and emit the epoch-0 training-shard
    * manifest: `(shard, seq_id, position, seq_tokens, ids_md5)` —
    * [[graft.queries.TrainQueries]] q148's layout plus `ids_md5`, the
    * md5 of the sequence's space-joined token-id stream, so the hash
    * check pins the CONTENT of every packed sequence through the whole
    * chain (a wrong cut, gate, drop, encode, offset, or gather anywhere
    * upstream changes some sequence's ids and breaks the hash).
    *
    * @param docs      corpus frame with `idCol` (long) and `textCol`
    * @param decontam  `Some((embeddings, centroids))` runs the q139
    *                  semantic-decontamination stage: rows of
    *                  `embeddings(vec_id, embedding)` with
    *                  `vec_id % evalMod == 0` are the benchmark suite;
    *                  surviving docs whose embedding falls within
    *                  cosine `tau` of any eval probe (through the
    *                  frozen IVF `centroids`) drop, as do the eval ids
    *                  themselves. `None` skips the stage (text-only
    *                  corpora — e.g. the TEXTSCALE sweeps — carry no
    *                  embedding table).
    * @param merges    frozen BPE merge table ([[graft.model.BpeMerges]])
    * @param idOf      frozen token-id vocabulary
    * @param minSpanLen exact-substring cut window (q134's 50)
    * @param tau       decontamination cosine threshold (q139's 0.4)
    * @param evalMod   eval-set id split (q139's 25)
    * @param seqLen    tokens per training sequence (512)
    * @param nShards   contiguous epoch-0 shards (q148's 8)
    * @param balanceBy shard-cut policy over the SAME md5 epoch-0 order:
    *                  `"count"` (q148 — ±1 sequence per shard; output
    *                  carries `position`) or `"tokens"` (q152,
    *                  [[Sharding.tokenBalancedShards]] — cut at token
    *                  prefix sums so every shard carries ≈ total/S
    *                  tokens; output carries `tok_start`). The skew
    *                  `"tokens"` exists for is REAL inside this
    *                  lineage: [[Packing.gatherSequences]] emits one
    *                  short final partial sequence per corpus, and a
    *                  doc-boundary-respecting packer upstream would
    *                  make every sequence's mass vary (r14 verdict #8).
    */
  def curateToShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      decontam: Option[(DataFrame, Array[Array[Double]])],
      merges: Seq[(String, String)],
      idOf: Map[String, Int],
      minSpanLen: Int = 50,
      tau: Double = 0.4,
      evalMod: Long = 25L,
      seqLen: Long = 512L,
      nShards: Long = 8L,
      balanceBy: String = "count"): DataFrame = {
    require(balanceBy == "count" || balanceBy == "tokens",
      s"balanceBy must be 'count' or 'tokens', got '$balanceBy'")
    // stage 1 — exact-substring duplicate cut (q134): the corpus with
    // every ≥ minSpanLen duplicated window removed, lowest-(id, pos)
    // occurrence kept
    val cut = ExactSubstr.cutDuplicateSpans(
      docs.select(col(idCol), col(textCol)), idCol, textCol, minLen = minSpanLen)
      .select(col(idCol), col("text_dedup").as(textCol))
    // stage 2 — Gopher quality gate (q51) over the CUT text: cutting
    // shrinks documents, so gate decisions genuinely depend on stage 1
    // (a doc cut below the 20-word floor drops HERE, not upstream) —
    // and the floor is what re-establishes Bpe.encode's ≥ 1-word input
    // contract after the cut may have emptied a document entirely
    val gated = QualityRules.gopherSignals(cut, textCol)
      .filter(col("gopher_pass"))
      .select(col(idCol), col(textCol))
    // stage 3 — semantic decontamination (q139): drop the benchmark
    // ids themselves plus any survivor within cosine tau of an eval
    // probe, blocked through the frozen IVF cells (corpus touched via
    // its rank-1 cell only — candidate volume nprobe·|eval|·N/K)
    val survivors = decontam match {
      case None => gated
      case Some((emb, centroids)) =>
        // localCheckpoint: gated feeds TWO consumers here — the
        // contamination lookup's semi-join AND the survivor filter —
        // and unpinned, the ENTIRE cut+gate prefix executed twice
        // (the q148/q151 two-consumer discipline). At 100 TB this
        // materialization is the curated-corpus handoff a production
        // pipeline persists between stages anyway.
        val pinned = gated.localCheckpoint(true)
        val vecs = emb.select(col("vec_id"), col("embedding"))
        val corpusSide = vecs
          .filter(col("vec_id") % evalMod =!= 0)
          .join(pinned.select(col(idCol).cast("long").as("vec_id")),
            Seq("vec_id"), "left_semi")
        val cont = Similarity.evalContaminated(
          corpusSide, vecs.filter(col("vec_id") % evalMod === 0),
          "vec_id", "embedding", tau = tau, centroids = centroids)
        pinned.filter(col(idCol) % evalMod =!= 0)
          .join(cont.select(col("vec_id").as(idCol)), Seq(idCol), "left_anti")
    }
    // stage 4 — BPE encode under the frozen fixture (q142)
    val enc = Bpe.encode(survivors, idCol, textCol, merges, idOf)
    // stage 5 — gather the packed sequences (q144); the gathered frame
    // feeds TWO consumers below (rank + 1-row total), so pin it once
    // (the q148 discipline). The pin is LAZY (r16, the CC probe
    // pattern): its first consumer is stage 6's construction-time
    // boundary-sampling job (globalRowNumber / tokenOffsets both run it
    // eagerly over the full frame before anything else), so that job
    // materializes the blocks — one job instead of eager-checkpoint job
    // + sampler job; the 1-row total and the exchange then read the
    // stored blocks.
    val gathered = Packing.gatherSequences(
      enc, "n_tokens", "bpe_ids", Seq(idCol), seqLen)
      .select(
        col("seq_id"),
        col("n_tokens").as("seq_tokens"),
        array_join(transform(col("token_ids"), _.cast("string")), " ")
          .as("__ids"))
      .localCheckpoint(eager = false)
    // stage 6 — epoch-0 shard manifest: md5 permutation, then the
    // chosen contiguous cut. Both arms are one ordered exchange plus a
    // ONE-ROW broadcast total (bounded by construction)
    val keyed = gathered
      .withColumn("__k", md5(concat_ws(":", col("seq_id"), lit(0))))
    if (balanceBy == "tokens")
      // q152's cut over q150's order: token prefix sums, shard =
      // tok_start · S DIV total — every shard ≈ total/S tokens no
      // matter how unequal the sequences are
      Sharding.tokenBalancedShards(
        keyed, "seq_tokens", Seq("__k", "seq_id"), nShards)
        .select(
          col("shard"), col("seq_id"), col("seq_tokens"),
          col("tok_start"), md5(col("__ids")).as("ids_md5"))
    else {
      // q148's cut: two-pass distributed rank, ±1-sequence shards
      val ranked = Ranking.globalRowNumber(
        keyed, Seq(col("__k"), col("seq_id")), "__rn")
      val total = gathered.agg(count(lit(1)).as("__total"))
      ranked.crossJoin(broadcast(total))
        .select(
          expr(s"(__rn - 1) * $nShards DIV __total").as("shard"),
          col("seq_id"),
          (col("__rn") - 1).as("position"),
          col("seq_tokens"),
          md5(col("__ids")).as("ids_md5"))
    }
  }
}
