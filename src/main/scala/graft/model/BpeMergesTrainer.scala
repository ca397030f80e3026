package graft.model

import graft.Tables

/** One-shot trainer for the [[BpeMerges]] fixture. Run manually when
  * the tokenizer shape changes:
  *
  * {{{ sbt "runMain graft.model.BpeMergesTrainer" }}}
  *
  * Trains [[graft.operators.Bpe.train]] (word-frequency table → 96
  * greedy merges, minFreq 2, ties on (l, r) code-point order — fully
  * deterministic, no seed needed) on the sf0.01 documents corpus and
  * writes `/graft/bpe_merges.csv` (one `l,r` line per merge, training
  * order). CSV tokens are written raw: the corpus alphabet is [a-z]
  * (plus the `</w>` marker), so no line can contain a comma — the
  * writer asserts that instead of escaping.
  */
object BpeMergesTrainer {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val resDir = java.nio.file.Paths.get(
      args.headOption.getOrElse("src/main/resources/graft"))
    require(!resDir.toString.contains("testdata"),
      s"arg is the fixture OUTPUT dir, not a corpus: $resDir")
    java.nio.file.Files.createDirectories(resDir)

    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val vocab = graft.operators.Bpe.wordFreq(docs, "text")
    val merges = graft.operators.Bpe.train(vocab, numMerges = 96, minFreq = 2L)
    merges.foreach { case (l, r) =>
      require(!l.contains(",") && !r.contains(",") &&
        !l.exists(_.isWhitespace) && !r.exists(_.isWhitespace),
        s"token needs escaping the fixture format does not have: ($l, $r)")
    }
    val out = resDir.resolve("bpe_merges.csv")
    java.nio.file.Files.write(out,
      merges.map { case (l, r) => s"$l,$r" }.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    println(s"[bpe-trainer] wrote ${merges.size} merges to $out")
    println(s"[bpe-trainer] first 10: ${merges.take(10).mkString(" ")}")
    spark.stop()
  }
}
