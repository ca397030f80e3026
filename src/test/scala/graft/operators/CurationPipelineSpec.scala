package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused curation lineage's INTERFACE claims, each exercised with a
  * planted corpus where the expected survivor set is derivable by hand:
  *
  *  - a document whose duplicated span is CUT below the Gopher 20-word
  *    floor drops at the gate (stage 2 genuinely consumes stage 1's
  *    output, not the raw corpus);
  *  - the keeper occurrence of the duplicated span survives intact;
  *  - eval-set ids and cosine-contaminated survivors drop at stage 3,
  *    and stage order matters (a contaminated doc already gated out
  *    must not resurrect);
  *  - the final manifest is EXACTLY what encode→gather→shard produce
  *    over the hand-derived survivor frame (content pinned by ids_md5),
  *    so survivor selection — the part only the composition exercises —
  *    is checked end to end;
  *  - `decontam = None` (text-only corpora, the TEXTSCALE arm) keeps
  *    every gate survivor including eval-pattern ids;
  *  - an all-filtered corpus yields an empty manifest, not a
  *    divide-by-zero on the global count.
  */
class CurationPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val merges = graft.model.BpeMerges.merges
  private val idOf = graft.model.BpeMerges.idOf

  /** n unique 4-char filler words with a distinguishing prefix, plus a
    * trailing stopword so the Gopher gate's stop_hits ≥ 1 holds; mean
    * word length ≈ 4, inside the [3.0, 4.6] band.
    */
  private def words(prefix: String, n: Int): String =
    ((1 to n).map(i => f"$prefix$i%03d") :+ "the").mkString(" ")

  // a 59-char shared span: 12 unique 4-char words
  private val span = (1 to 12).map(i => f"s$i%03d").mkString(" ")

  /** Corpus: 1/2/27 survive; 3 is cut below the gate floor; 25/50 are
    * eval ids; 26 is cosine-contaminated.
    */
  private def corpus = Seq(
    (1L, words("a", 24)),              // 25 words, clean → survives
    (2L, span + " " + words("b", 20)), // keeper of the span → survives
    (3L, span + " " + words("c", 9)),  // loses the span → 10 words → gated
    (25L, words("d", 30)),             // eval id → dropped at stage 3
    (26L, words("e", 30)),             // contaminated embedding → dropped
    (27L, words("f", 30)),             // clean embedding → survives
    (50L, words("g", 30))              // eval id → dropped at stage 3
  ).toDF("doc_id", "text")

  private val centroids = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0))

  private def emb = Seq(
    (1L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),  // contaminated-looking, but gated
    (25L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), // eval probe
    (26L, Seq(0.9f, 0.1f, 0.0f, 0.0f)), // cos ≈ 0.99 to eval 25 → drops
    (27L, Seq(0.0f, 0.0f, 0.0f, 1.0f)), // orthogonal to both evals
    (50L, Seq(0.0f, 1.0f, 0.0f, 0.0f))  // eval probe
  ).toDF("vec_id", "embedding")

  /** encode→gather→shard over an explicit survivor frame — the
    * trailing stages applied directly, for comparison against the
    * fused operator's output.
    */
  private def expectedManifest(surv: org.apache.spark.sql.DataFrame) = {
    val enc = Bpe.encode(surv, "doc_id", "text", merges, idOf)
    val gathered = Packing.gatherSequences(
      enc, "n_tokens", "bpe_ids", Seq("doc_id"), 512L)
      .select(col("seq_id"), col("n_tokens").as("seq_tokens"),
        array_join(transform(col("token_ids"), _.cast("string")), " ")
          .as("__ids"))
      .localCheckpoint(true)
    val keyed = gathered
      .withColumn("__k", md5(concat_ws(":", col("seq_id"), lit(0))))
    val ranked = Ranking.globalRowNumber(
      keyed, Seq(col("__k"), col("seq_id")), "__rn")
    val total = gathered.agg(count(lit(1)).as("__total"))
    ranked.crossJoin(broadcast(total))
      .select(
        expr("(__rn - 1) * 8 DIV __total").as("shard"),
        col("seq_id"), (col("__rn") - 1).as("position"),
        col("seq_tokens"), md5(col("__ids")).as("ids_md5"))
  }

  test("planted corpus: cut feeds the gate, eval + contaminated drop, " +
    "and the manifest equals the trailing stages over the hand-derived " +
    "survivor set") {
    val out = CurationPipeline.curateToShards(
      corpus, "doc_id", "text",
      decontam = Some((emb, centroids)),
      merges = merges, idOf = idOf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // hand-derived survivors: 1, 2 (keeper, span intact), 27
    val surv = corpus.filter(col("doc_id").isin(1L, 2L, 27L))
    val exp = expectedManifest(surv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(out.sorted.toSeq == exp.sorted.toSeq)
    assert(out.nonEmpty)
    // manifest invariants: positions 0..n-1, non-final sequences full
    assert(out.map(_._3).sorted.toSeq == (0L until out.length.toLong))
    assert(out.map(_._4).sum ==
      Bpe.encode(surv, "doc_id", "text", merges, idOf)
        .agg(sum("n_tokens")).head.getLong(0))
  }

  test("decontam = None keeps every gate survivor (text-only corpora)") {
    val out = CurationPipeline.curateToShards(
      corpus, "doc_id", "text", decontam = None,
      merges = merges, idOf = idOf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // gate survivors: everyone but the cut-shrunk doc 3
    val surv = corpus.filter(col("doc_id") =!= 3L)
    val exp = expectedManifest(surv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(out.sorted.toSeq == exp.sorted.toSeq)
    assert(out.length > 0)
  }

  test("all-filtered corpus yields an empty manifest, no divide-by-zero") {
    val tiny = Seq((1L, "too short"), (2L, "also tiny")).toDF("doc_id", "text")
    assert(CurationPipeline.curateToShards(
      tiny, "doc_id", "text", decontam = None,
      merges = merges, idOf = idOf).count() == 0L)
  }

  test("balanceBy = tokens: identical sequence content and md5 order as " +
    "the count cut, shard ids from token prefix sums") {
    val count = CurationPipeline.curateToShards(
      corpus, "doc_id", "text", decontam = Some((emb, centroids)),
      merges = merges, idOf = idOf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val tokens = CurationPipeline.curateToShards(
      corpus, "doc_id", "text", decontam = Some((emb, centroids)),
      merges = merges, idOf = idOf, balanceBy = "tokens")
      .select("shard", "seq_id", "seq_tokens", "tok_start", "ids_md5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // the cut policy must not change WHAT is sharded: same sequence
    // set, same token masses, same content hashes
    assert(tokens.map(t => (t._2, t._3, t._5)).sorted.toSeq ==
      count.map(c => (c._2, c._4, c._5)).sorted.toSeq)
    // tok_start is the prefix sum of seq_tokens along the SAME md5
    // epoch-0 order the count cut ranked (position order), and shard =
    // tok_start * 8 DIV total
    val total = tokens.map(_._3).sum
    val byPosition = count.sortBy(_._3).map(_._2) // seq_id in rank order
    val tokOf = tokens.map(t => t._2 -> t).toMap
    var run = 0L
    byPosition.foreach { sid =>
      val t = tokOf(sid)
      assert(t._4 == run, s"seq $sid tok_start ${t._4} != prefix $run")
      assert(t._1 == t._4 * 8L / math.max(total, 1L), s"seq $sid shard")
      run += t._3
    }
    assert(run == total)
    // empty-corpus safety for the tokens arm too
    val tiny = Seq((1L, "too short")).toDF("doc_id", "text")
    assert(CurationPipeline.curateToShards(
      tiny, "doc_id", "text", decontam = None,
      merges = merges, idOf = idOf, balanceBy = "tokens").count() == 0L)
  }
}
