package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("gopherSignals: word count, mean word length, stopword hits, pass rule") {
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog ran off to town again today " +
        "with many more words here to clear the minimum twenty word gate ok"),
      (2L, "short text"),                // too few words
      (3L, ("zz " * 30).trim)            // no stopwords, mean len 2
    ).toDF("doc_id", "text")
    val out = QualityRules.gopherSignals(docs, "text", minWords = 5, maxWords = 90)
      .select("doc_id", "n_words", "stop_hits", "gopher_pass")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 27 && out(1L)._3 == 3 && out(1L)._4)
    assert(out(2L)._2 == 2 && !out(2L)._4)
    assert(out(3L)._3 == 0 && !out(3L)._4) // stopword gate fails
  }

  test("duplicateBigramFraction: top bigram over total bigrams") {
    val docs = Seq(
      (1L, "a b a b a b"),   // bigrams: "a b"x3, "b a"x2 → top 3 of 5
      (2L, "x y z"),         // "x y", "y z" → top 1 of 2
      (3L, "solo")           // <2 tokens → dropped
    ).toDF("doc_id", "text")
    val out = QualityRules.duplicateBigramFraction(docs, "doc_id", "text")
      .select("doc_id", "top_bigram_n", "n_bigrams")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(1L -> ((3L, 5L)), 2L -> ((1L, 2L))))
  }

  test("greedyPack: first-fit in order, resets per group, oversize gets own bin") {
    val rows = Seq(
      ("en", 1L, 100L), ("en", 2L, 100L), ("en", 3L, 100L), // 100+100 | 100
      ("en", 4L, 300L),                                     // oversize → own bin
      ("en", 5L, 10L),
      ("de", 6L, 250L), ("de", 7L, 6L)
    ).toDF("lang", "doc_id", "n_tokens")
    val out = Packing
      .greedyPack(rows, "lang", "n_tokens", Seq("doc_id"), capacity = 256L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3,
      6L -> 0, 7L -> 0))
  }

  test("property: greedyPack matches the sequential driver fold (seeded random)") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val cap = 50L + rng.nextInt(100)
      val rows = (1L to 300L).map { i =>
        (s"g${rng.nextInt(4)}", i, rng.nextInt(80).toLong)
      }
      val out = Packing
        .greedyPack(rows.toDF("g", "id", "sz"), "g", "sz", Seq("id"), cap)
        .select("g", "id", "bin").as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // reference: per-group sequential first-fit in id order
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        var bin = 0L; var used = 0L; var first = true
        rs.sortBy(_._2).map { case (_, id, sz) =>
          if (first) { used = sz; first = false }
          else if (used + sz > cap) { bin += 1; used = sz }
          else used += sz
          (g, id) -> bin
        }
      }
      assert(out == expected, s"trial $trial cap $cap")
    }
  }

  test("property: jaccardJoin equals brute force across seeds and taus") {
    for ((seed, tau) <- Seq((1, 0.3), (2, 0.6), (3, 0.8))) {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      val docs = (1L to 30L).map { i =>
        (i, Vector.fill(8 + rng.nextInt(6))(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val fast = SimilarityJoin
        .jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", tau, shingleWords = 2)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      def sh(t: String) = t.split(" ").filter(_.nonEmpty).sliding(2).map(_.mkString(" ")).toSet
      val sets = docs.map { case (i, t) => i -> sh(t) }
      val brute = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a < b && sa.nonEmpty && sb.nonEmpty
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= tau
      } yield (a, b)).toSet
      assert(fast == brute, s"seed $seed tau $tau")
    }
  }

  test("capPerGroup: top-n per group under the given order") {
    val docs = Seq(
      (1L, "en", 50L), (2L, "en", 90L), (3L, "en", 70L),
      (4L, "de", 10L)
    ).toDF("doc_id", "lang", "n_chars")
    val out = Sampling
      .capPerGroup(docs, Seq("lang"), Seq($"n_chars".desc, $"doc_id".asc), n = 2)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    assert(out == Map(2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("weightedSample: deterministic, k rows, favors heavy weights") {
    val docs = (1L to 1000L)
      .map(i => (i, if (i <= 20) 100000L else 1L)).toDF("doc_id", "w")
    val s1 = Sampling.weightedSample(docs, "doc_id", "w", k = 30)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(docs, "doc_id", "w", k = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 30)
    // nearly all 20 heavy ids (weight ratio 1e5) should be sampled
    assert((1L to 20L).count(s1.contains) >= 18)
  }

  test("dsirSelect: deterministic, target-like docs outscore off-domain ones") {
    // target domain speaks {alpha beta gamma}; the raw background speaks
    // {zulu yankee xray}. Two non-target probes: one written in the
    // target vocabulary, one in the background vocabulary — DSIR must
    // rank the target-like probe far above the background-like one.
    val docs =
      (1L to 20L).map(i => (i, "alpha beta gamma alpha beta gamma alpha", "t")) ++
        (21L to 40L).map(i => (i, "zulu yankee xray zulu yankee xray zulu", "r")) ++
        Seq(
          (97L, "alpha beta gamma alpha beta gamma alpha", "r"), // target-like probe
          (98L, "zulu yankee xray zulu yankee xray zulu", "r"),  // background probe
          (99L, "", "r"))                                        // featureless
    val df = docs.toDF("doc_id", "text", "lang")
    def run() = Sampling
      .dsirSelect(df, "doc_id", "text", isTarget = $"lang" === "t",
        buckets = 64, k = 43)
      .select("doc_id", "logratio_fp", "sel_fp")
      .as[(Long, Long, Long)].collect()
    val r1 = run()
    assert(r1.toSeq == run().toSeq, "selection must be a pure function of the data")
    assert(r1.length == 43)
    val byId = r1.map(r => r._1 -> r._2).toMap
    assert(byId(97L) > byId(98L),
      s"target-like probe must outscore the background probe: $byId")
    assert(byId(97L) == byId(1L), "identical text ⇒ identical logratio")
    assert(byId(99L) == 0L, "featureless doc scores the empty sum")
    // Gumbel-perturbed order is descending in sel_fp
    assert(r1.map(_._3).toSeq == r1.map(_._3).sortBy(-_).toSeq)
  }

  test("tokenOffsets: exact exclusive prefix sum, invariant to partitioning") {
    // sizes with nulls, zeros, negatives (→ 0) and a giant doc
    val rng = new scala.util.Random(7)
    val rows = (1L to 500L).map { i =>
      val sz: java.lang.Long =
        if (i % 71 == 0) null
        else if (i % 53 == 0) -5L
        else if (i == 250L) 100000L
        else rng.nextInt(900).toLong
      (i, sz)
    }
    val df = rows.toDF("doc_id", "n_tokens")
    // sequential brute force
    var acc = 0L
    val expect = rows.sortBy(_._1).map { case (id, sz) =>
      val s = Option(sz).map(_.longValue).filter(_ > 0).getOrElse(0L)
      val r = (id, acc); acc += s; r
    }.toMap
    def run(): Map[Long, Long] = Packing
      .tokenOffsets(df, "n_tokens", Seq("doc_id"))
      .select("doc_id", "tok_start").as[(Long, Long)].collect().toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      assert(run() == expect)
      // exchange-boundary invariance: same offsets under a different
      // range-partition width
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(run() == expect)
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      assert(run() == expect)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("gatherSequences: hand-checked fragments — spanning doc, abutting docs, partial tail") {
    // capacity 5; stream = d1(3) d2(4) d3(6) d4(2) = 15 tokens → 3 full seqs
    // d2 spans seq0/seq1; d3 spans seq1/seq2; seq2 = tail of d3 + all of d4
    val df = Seq(
      (1L, 3L, "10 11 12"),
      (2L, 4L, "20 21 22 23"),
      (3L, 6L, "30 31 32 33 34 35"),
      (4L, 2L, "40 41")
    ).toDF("doc_id", "n_tokens", "bpe_ids")
    val out = Packing
      .gatherSequences(df, "n_tokens", "bpe_ids", Seq("doc_id"), capacity = 5L)
      .select($"seq_id", $"n_tokens", array_join($"token_ids", " "))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 5L, "10 11 12 20 21"),
      (1L, 5L, "22 23 30 31 32"),
      (2L, 5L, "33 34 35 40 41")))
  }

  test("property: gatherSequences round-trips the stream; every non-final " +
    "sequence is exactly full (seeded random, zero-size rows dropped)") {
    val rng = new scala.util.Random(11)
    for (cap <- Seq(7L, 32L)) {
      val rows = (1L to 120L).map { i =>
        val n = rng.nextInt(3) match {
          case 0 => 0L                       // dropped: contributes nothing
          case _ => 1L + rng.nextInt(50).toLong
        }
        (i, n, (0L until n).map(t => i * 1000 + t).mkString(" "))
      }
      val out = Packing
        .gatherSequences(rows.toDF("doc_id", "n_tokens", "bpe_ids"),
          "n_tokens", "bpe_ids", Seq("doc_id"), cap)
        .select($"seq_id", $"n_tokens", array_join($"token_ids", " "))
        .as[(Long, Long, String)].collect().sortBy(_._1)
      val stream = rows.sortBy(_._1).map(_._3).filter(_.nonEmpty).mkString(" ")
      val total = rows.map(_._2).sum
      assert(out.map(_._3).filter(_.nonEmpty).mkString(" ") == stream)
      assert(out.map(_._1).toSeq == (0L until (total + cap - 1) / cap))
      assert(out.dropRight(1).forall(_._2 == cap))
      assert(out.forall(s => s._3.split(" ").length.toLong == s._2))
    }
  }

  test("q145 boundaries tile each sequence exactly and agree with q144's " +
    "token counts; q146 is a fresh permutation per epoch (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val gather = graft.SparkEntry.queries("q144_pack_gather")(spark, sf)
      .select($"seq_id", $"n_tokens").as[(Long, Long)].collect().toMap
    val bounds = graft.SparkEntry.queries("q145_pack_boundaries")(spark, sf)
      .select($"seq_id", $"n_docs", $"boundaries")
      .as[(Long, Long, String)].collect()
    assert(bounds.map(_._1).toSet == gather.keySet)
    bounds.foreach { case (seq, nDocs, b) =>
      val frags = b.split(" ").map { sl =>
        val Array(s, l) = sl.split(":"); (s.toLong, l.toLong)
      }
      assert(frags.length == nDocs)
      // fragments tile the sequence contiguously from 0 and sum to the
      // gathered token count
      assert(frags.head._1 == 0L)
      frags.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s2 == s1 + l1, s"seq $seq")
        case _ =>
      }
      assert(frags.map(_._2).sum == gather(seq), s"seq $seq")
    }
    val order = graft.SparkEntry.queries("q146_epoch_order")(spark, sf)
      .select($"epoch", $"seq_id", $"position")
      .as[(Long, Long, Long)].collect()
    val byEpoch = order.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.foreach { case (_, rows) =>
      assert(rows.map(_._2).toSet == gather.keySet)          // every seq once
      assert(rows.map(_._3).sorted.toSeq == rows.indices.map(_.toLong)) // 0..n-1
    }
    // different epochs really reorder (md5 keys differ per epoch)
    val pos0 = byEpoch(0L).map(r => r._2 -> r._3).toMap
    val pos1 = byEpoch(1L).map(r => r._2 -> r._3).toMap
    assert(pos0 != pos1)
  }

  test("q148 shards are contiguous position ranges, balanced to ±1, and " +
    "cover the epoch-0 order exactly (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q148_shard_assign")(spark, sf)
      .select($"shard", $"seq_id", $"position", $"seq_tokens")
      .as[(Long, Long, Long, Long)].collect()
    val n = rows.length
    // positions are exactly 0..n-1; seq ids unique
    assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq)
    assert(rows.map(_._2).distinct.length == n)
    // shard ids follow position order (contiguous ranges), sizes ±1
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet == (0L until 8L).toSet)
    val sizes = byShard.values.map(_.length).toSeq
    assert(sizes.max - sizes.min <= 1, sizes.toString)
    byShard.foreach { case (sh, rs) =>
      val ps = rs.map(_._3).sorted
      assert(ps.last - ps.head + 1 == ps.length, s"shard $sh not contiguous")
    }
    // shard of a position matches q146 epoch 0: same md5 order
    val e0 = graft.SparkEntry.queries("q146_epoch_order")(spark, sf)
      .filter($"epoch" === 0L).select($"seq_id", $"position")
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (_, seq, pos, _) => assert(e0(seq) == pos) }
    // every sequence except the stream tail (max seq_id) is exactly full
    val tailSeq = rows.map(_._2).max
    rows.foreach { case (_, seq, _, tk) =>
      if (seq != tailSeq) assert(tk == 512L, s"seq $seq has $tk tokens")
      else assert(tk >= 1L && tk <= 512L)
    }
  }

  test("tokenOffsets: consumers read the materialized sort — no range exchange in the executed plan") {
    // offset correctness rests on the totals aggregate and the fold
    // consuming the SAME physical partition boundaries. That used to
    // lean on AQE's runtime exchange reuse (r11 ADVICE: reuseExchange
    // off, or one consumer getting column-pruned, silently re-splits the
    // exchanges → wrong offsets, no error); the sorted+pid-stamped frame
    // is now eagerly checkpointed, so the ONE range exchange runs inside
    // the materialization job and the query plan itself must contain
    // NONE — a range exchange reappearing here means a future edit
    // re-introduced a per-consumer sort and the invariant is back to
    // resting on plan canonicalization.
    val df = (1L to 2000L).map(i => (i, i % 97)).toDF("doc_id", "n_tokens")
    val q = Packing.tokenOffsets(df, "n_tokens", Seq("doc_id"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Exchange rangepartitioning"),
      s"expected the range exchange to live ONLY inside the checkpoint materialization:\n$p")
    // and the pin is real: the plan reads checkpointed blocks, not lineage
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("tokenOffsets is reuseExchange-independent (the r11 ADVICE scenario)") {
    // under the OLD reliance, spark.sql.execution.reuseExchange=false
    // made the two consumers sample DIFFERENT range boundaries → silently
    // wrong offsets. The materialization pin must make this config a
    // no-op for correctness.
    val rows = (1L to 500L).map(i => (i, (i * 31) % 113))
    val df = rows.toDF("doc_id", "n_tokens")
    var acc = 0L
    val expect = rows.sortBy(_._1).map { case (id, sz) =>
      val r = (id, acc); acc += sz; r
    }.toMap
    // the REAL conf key, taken from SQLConf so a rename fails at compile
    // time — spark.conf.set silently accepts unknown keys, and the r12
    // ADVICE caught this test passing vacuously under a misspelled one
    val key =
      org.apache.spark.sql.internal.SQLConf.EXCHANGE_REUSE_ENABLED.key
    spark.conf.set(key, "false")
    try {
      val got = Packing.tokenOffsets(df, "n_tokens", Seq("doc_id"))
        .select("doc_id", "tok_start").as[(Long, Long)].collect().toMap
      assert(got == expect)
    } finally spark.conf.unset(key)
  }

  test("jaccardJoin matches brute force on a small corpus") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val docs = (1L to 40L).map { i =>
      val base = Vector.fill(12)(vocab(rng.nextInt(vocab.size)))
      // clusters of 4 share a base text with light mutation → real pairs
      val words = if (i % 4 == 0) base
        else Vector.fill(12)(vocab(rng.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val fast = SimilarityJoin.jaccardJoin(df, "doc_id", "text", tau = 0.4, shingleWords = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    def shingles(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(2).map(_.mkString(" ")).toSet
    val sets = docs.map { case (i, t) => i -> shingles(t) }.filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.4
    } yield (a, b)).toSet
    assert(fast == brute)
    assert(brute.nonEmpty) // the test actually exercised matching pairs
  }

  test("benchmarkOverlap: counts distinct shared shingles, excludes bench ids") {
    val docs = Seq(
      (1L, "one two three four five six seven"),  // bench doc
      (2L, "one two three four five nine ten"),   // shares 1 5-shingle
      (3L, "a b c d e f g"),                      // clean
      (4L, "one two three four five six eight")   // shares 2
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 1L)
    val out = Contamination.benchmarkOverlap(docs, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 1L, 4L -> 2L))
  }

  test("bigramLmScore: add-one-smoothed bigram log-probs, hand-computed") {
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "c c")).toDF("doc_id", "text")
    val out = QualityRules.bigramLmScore(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "lm_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // uni: a=3 b=2 c=2, V=3; bi: "a b"=2 "b a"=1 "c c"=1
    assert(out(1L)._1 == 2)
    assert(math.abs(out(1L)._2 - (math.log(3.0 / 6) + math.log(2.0 / 5)) / 2) < 1e-12)
    assert(math.abs(out(2L)._2 - math.log(3.0 / 6)) < 1e-12)
    assert(math.abs(out(3L)._2 - math.log(2.0 / 5)) < 1e-12)
  }

  /** Independent in-memory interpolated-KN replica (Chen & Goodman 1999
    * eq. 4.25 bigram form) used by the knBigramLmScore tests. With
    * `model` given, replays the cross-corpus OOV ladder of
    * knBigramLmScoreAgainst (backoff mass for seen contexts, pure
    * continuation for unseen ones, 1/(2T) continuation floor).
    */
  private def knBrute(
      corpus: Seq[(Long, String)],
      model: Option[Seq[String]] = None): Map[Long, (Long, Long)] = {
    def big(t: String) = t.split(" ").filter(_.nonEmpty).sliding(2)
      .filter(_.length == 2).map(a => (a(0), a(1))).toSeq
    val bgs = corpus.map { case (id, t) => id -> big(t) }
    val cb = model.map(_.flatMap(big)).getOrElse(bgs.flatMap(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1p = cb.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1l = cb.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val t = cb.size.toLong
    val n1 = cb.values.count(_ == 1L)
    val n2 = cb.values.count(_ == 2L)
    val d = if (n1 + 2 * n2 > 0) n1.toDouble / (n1 + 2 * n2) else 0.5
    val qlp = bgs.flatMap(_._2).distinct.map { bg =>
      val contP = n1l.get(bg._2).map(_.toDouble / t).getOrElse(0.5 / t)
      val p = (cb.get(bg), c1.get(bg._1)) match {
        case (Some(c), Some(cc)) => (c - d) / cc + d * n1p(bg._1) / cc * contP
        case (None, Some(cc))    => d * n1p(bg._1) / cc * contP
        case _                   => contP
      }
      bg -> math.floor(math.log(p) * 1000000 + 0.50001).toLong
    }.toMap
    bgs.filter(_._2.nonEmpty).map { case (id, bb) =>
      id -> ((bb.size.toLong, bb.map(qlp).sum))
    }.toMap
  }

  test("knBigramLmScore: interpolated Kneser-Ney, hand-checked discounts") {
    val corpus = Seq((1L, "a b a"), (2L, "a b"), (3L, "c c"), (4L, "solo"))
    val out = QualityRules.knBigramLmScore(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "n_bigrams", "kn_fp")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // types: "a b"=2, "b a"=1, "c c"=1 → n1=2 n2=1 → D=0.5, T=3
    // P(b|a) = 1.5/2 + 0.5*(1/2)*(1/3) = 5/6; P(a|b) = P(c|c) = 2/3
    val q56 = math.floor(math.log(5.0 / 6) * 1000000 + 0.50001).toLong
    val q23 = math.floor(math.log(2.0 / 3) * 1000000 + 0.50001).toLong
    assert(out == Map(
      1L -> ((2L, q56 + q23)), 2L -> ((1L, q56)), 3L -> ((1L, q23))))
    assert(out == knBrute(corpus)) // replica agrees with the hand math
  }

  test("property: knBigramLmScore matches the in-memory replica; " +
    "partition-invariant (seeded random corpora)") {
    val rng = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "gg")
    for (_ <- 1 to 3) {
      val corpus = (1L to 60L).map { i =>
        i -> Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      val df = corpus.toDF("doc_id", "text")
      val got = QualityRules.knBigramLmScore(df, "doc_id", "text")
        .select("doc_id", "n_bigrams", "kn_fp")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == knBrute(corpus))
      val got7 = QualityRules.knBigramLmScore(df.repartition(7), "doc_id", "text")
        .select("doc_id", "n_bigrams", "kn_fp")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got7 == got) // LONG fixed-point sums: schedule-independent
    }
  }

  test("kn wideKeys=true (16-byte md5 type keys) is bit-identical to the " +
    "64-bit default, self-scoring and cross-corpus") {
    val rng = new scala.util.Random(17)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "gg", "hh")
    val corpus = (1L to 60L).map { i =>
      i -> Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val modelTexts = (1 to 20).map(_ =>
      Seq.fill(1 + rng.nextInt(10))(vocab(rng.nextInt(4))).mkString(" "))
    val df = corpus.toDF("doc_id", "text")
    val mdf = modelTexts.map(Tuple1(_)).toDF("text")
    def self() = QualityRules.knBigramLmScore(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "kn_fp")
      .as[(Long, Long, Long)].collect().toSet
    def cross() = QualityRules.knBigramLmScoreAgainst(df, mdf, "doc_id", "text")
      .select("doc_id", "n_bigrams", "kn_fp")
      .as[(Long, Long, Long)].collect().toSet
    val (s64, c64) = (self(), cross())
    spark.conf.set("spark.graft.kn.wideKeys", "true")
    try {
      assert(self() == s64, "wide keys changed the self-scoring output")
      assert(cross() == c64, "wide keys changed the cross-corpus output")
    } finally spark.conf.unset("spark.graft.kn.wideKeys")
  }

  test("knBigramLmScoreAgainst: OOV ladder hand-checked; cross-corpus " +
    "property vs the replica; empty model errors loudly") {
    // model: "a b a" — types "a b"(1), "b a"(1); T=2, n1=2, n2=0 → D=1.0
    // c(a·)=1, N1+(a·)=1; contP: b -> 1/2, a -> 1/2; OOV floor 1/(2·2)
    val model = Seq("a b a")
    val scored = Seq(
      (1L, "a b"),    // seen pair:     (1-1)/1 + 1*(1/1)*(1/2)   = 0.5
      (2L, "a c"),    // seen ctx, OOV: 1*(1/1)*0.25              = 0.25
      (3L, "z b"),    // unseen ctx:    contP(b)                  = 0.5
      (4L, "z q"))    // all OOV:       floor                     = 0.25
    val out = QualityRules.knBigramLmScoreAgainst(
      scored.toDF("doc_id", "text"),
      model.map(Tuple1(_)).toDF("text"), "doc_id", "text")
      .select("doc_id", "n_bigrams", "kn_fp")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def q(p: Double) = math.floor(math.log(p) * 1000000 + 0.50001).toLong
    assert(out == Map(
      1L -> ((1L, q(0.5))), 2L -> ((1L, q(0.25))),
      3L -> ((1L, q(0.5))), 4L -> ((1L, q(0.25)))))
    assert(out == knBrute(scored, Some(model)))
    val rng = new scala.util.Random(13)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "gg", "hh", "ii")
    for (_ <- 1 to 2) {
      val corpus = (1L to 80L).map { i =>
        i -> Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      // model = a vocabulary-restricted slice, so real OOV mass appears
      val modelTexts = (1 to 25).map(_ =>
        Seq.fill(1 + rng.nextInt(10))(vocab(rng.nextInt(4))).mkString(" "))
      val got = QualityRules.knBigramLmScoreAgainst(
        corpus.toDF("doc_id", "text"),
        modelTexts.map(Tuple1(_)).toDF("text"), "doc_id", "text")
        .select("doc_id", "n_bigrams", "kn_fp")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == knBrute(corpus, Some(modelTexts)))
    }
    val err = intercept[Exception] {
      QualityRules.knBigramLmScoreAgainst(
        Seq((1L, "a b")).toDF("doc_id", "text"),
        Seq(Tuple1("solo")).toDF("text"), "doc_id", "text").collect()
    }
    assert(err.getMessage != null)
  }

  test("balanceGroups: min group kept whole, others downsampled to parity") {
    val docs = ((1L to 500L).map(i => (i, "en")) ++ (501L to 600L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val kept = Sampling.balanceGroups(docs, "doc_id", Seq("lang"))
      .as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("de") == 100)                       // rate 1.0 — all kept
    assert(byLang("en") > 60 && byLang("en") < 140)   // ~100 of 500
    val again = Sampling.balanceGroups(docs, "doc_id", Seq("lang"))
      .as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)                 // deterministic
  }

  test("mixToTarget: requested mix at the scarcest group's full size") {
    val docs = ((1L to 800L).map(i => (i, "web")) ++
      (801L to 900L).map(i => (i, "code")) ++
      (901L to 1200L).map(i => (i, "junk")))
      .toDF("doc_id", "src")
    val kept = Sampling.mixToTarget(docs, "doc_id", "src",
      Map("web" -> 0.75, "code" -> 0.25))
      .as[(Long, String)].collect()
    val by = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!by.contains("junk"))          // untargeted group dropped
    assert(by("code") == 100)             // scarcest group kept whole
    // N* = 100/0.25 = 400 → web expects 300 of 800 (md5 gate, ±)
    assert(by("web") > 240 && by("web") < 360)
    val again = Sampling.mixToTarget(docs, "doc_id", "src",
      Map("web" -> 0.75, "code" -> 0.25)).as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)     // deterministic
  }

  test("temperatureMix: alpha=1 is the identity mixture; alpha=0.5 " +
    "upsamples the scarce group by fractional repetition, deterministically") {
    val docs = ((1L to 80L).map(i => (i, "en")) ++
      (81L to 100L).map(i => (i, "fr")))
      .toDF("doc_id", "lang")
    // alpha=1: natural proportions — every rate is exactly 1.0, output
    // == input with copy=1
    val nat = Sampling.temperatureMix(docs, "doc_id", "lang", alpha = 1.0)
      .as[(Long, String, Long)].collect()
    assert(nat.length == 100 && nat.forall(_._3 == 1L))
    // alpha=0.5: w = (sqrt80, sqrt20), shares (2/3, 1/3); rates
    // r_en = 100*(2/3)/80 = 0.8333 (downsample), r_fr = 100*(1/3)/20
    // = 1.6667 (upsample): every fr doc appears 1 or 2 times, every en
    // doc 0 or 1 — repetition is spread, never concentrated
    val out = Sampling.temperatureMix(docs, "doc_id", "lang", alpha = 0.5)
      .as[(Long, String, Long)].collect()
    val perDoc = out.groupBy(_._1).view.mapValues(_.length).toMap
    (81L to 100L).foreach(i => assert(Seq(1, 2).contains(perDoc(i))))
    (1L to 80L).foreach(i => assert(perDoc.getOrElse(i, 0) <= 1))
    // copy indices are 1..n per doc
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // expected sizes land near the temperature shares (md5 gate, ±)
    val by = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(by("fr") >= 28 && by("fr") <= 40)  // E = 33.3
    assert(by("en") >= 58 && by("en") <= 74)  // E = 66.7
    // pure function of the data
    val again = Sampling.temperatureMix(docs, "doc_id", "lang", alpha = 0.5)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq ==
      again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("temperatureMix: non-string group keys work; null keys are " +
    "rejected loudly instead of silently dropping in the rate join") {
    // int language id — the r13 ADVICE case: the old (String, Long)
    // encoder cast failed at runtime for any non-string group column
    val intKeyed = ((1L to 80L).map(i => (i, 1)) ++
      (81L to 100L).map(i => (i, 2))).toDF("doc_id", "lang_id")
    val out = Sampling.temperatureMix(intKeyed, "doc_id", "lang_id", alpha = 1.0)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 100 && out.forall(_._3 == 1L))
    val withNull = Seq((1L, Some("en")), (2L, None), (3L, Some("fr")))
      .toDF("doc_id", "lang")
    val ex = intercept[IllegalArgumentException] {
      Sampling.temperatureMix(withNull, "doc_id", "lang", alpha = 0.5).collect()
    }
    assert(ex.getMessage.contains("null"))
  }

  test("exact dedup end-to-end: one survivor (min id) per near-dup cluster") {
    val t1 = "alpha beta gamma delta eps zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, t1), (5L, t1), (9L, t1),       // cluster {1,5,9} → survivor 1
      (2L, t2), (7L, t2),                 // cluster {2,7} → survivor 2
      (3L, "lone wolf text with enough words to shingle fine today")
    ).toDF("doc_id", "text")
    val pairs = SimilarityJoin.jaccardJoin(docs, "doc_id", "text", tau = 0.5)
      .select($"a_id", $"b_id")
    val dropped = ConnectedComponents.byMinLabel(pairs)
      .filter($"id" =!= $"component").select($"id".as("doc_id"))
    val survivors = docs.select("doc_id").join(dropped, Seq("doc_id"), "left_anti")
      .as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 3L))
  }

  test("chunkWindows: strided windows, short tail, no redundant suffix window") {
    def chunks(text: String, size: Int, stride: Int): Seq[String] =
      Seq((1L, text)).toDF("id", "t")
        .select(explode(TextAnalysis.chunkWindows($"t", size, stride)).as("c"))
        .as[String].collect().toSeq
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // size 4 stride 3 over 10 tokens: starts 0,3,6 (0,3 don't reach the
    // end; 6..10 covers it) — NOT also 9 (suffix of the previous window)
    assert(chunks(ten, 4, 3) == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(chunks(ten, 20, 5) == Seq(ten))     // one covering window
    assert(chunks("  ", 4, 3).isEmpty)         // whitespace-only
    assert(chunks("a  b", 1, 1) == Seq("a", "b")) // multi-space tokenize
  }

  test("redactPii replaces emails and phones, piiCount counts them") {
    val df = Seq((1L, "mail a.b@x.co or 555-1234 now")).toDF("id", "t")
    val out = df.select(
      TextAnalysis.redactPii($"t").as("r"),
      TextAnalysis.piiCount($"t", TextAnalysis.emailPattern).as("ne"),
      TextAnalysis.piiCount($"t", TextAnalysis.phonePattern).as("np")
    ).as[(String, Int, Int)].head()
    assert(out == (("mail <EMAIL> or <PHONE> now", 1, 1)))
  }
}
