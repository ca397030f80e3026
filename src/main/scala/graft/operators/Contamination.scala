package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark contamination detection: flag training documents sharing
  * word n-grams with a held-out benchmark/eval set — the standard
  * decontamination step before pretraining (cf. GPT-3 appendix C,
  * Dodge et al. 2021 on C4/benchmark overlap).
  *
  * Scale design (100 TB): the benchmark side is small by nature (eval
  * sets, not corpora) — its distinct shingle set is broadcast, so the
  * corpus side is one scan + generator + hash-aggregate, no corpus
  * shuffle for the probe. Counting uses the per-document DISTINCT
  * shingle set, so a repeated contaminated n-gram counts once.
  */
object Contamination {

  /** Per-document count of distinct word `n`-gram shingles that also
    * occur anywhere in `bench`. Only contaminated documents are returned
    * (n_contaminated ≥ 1); rows of `docs` that also appear in `bench`
    * (same id) are excluded from the probe side.
    */
  def benchmarkOverlap(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 5): DataFrame = {
    def shingleRows(df: DataFrame) = df.select(
      col(idCol).as("__id"),
      explode(QualityRules.wordShingles(col(textCol), shingleWords)).as("__s"))

    val benchShingles = shingleRows(bench).select("__s").distinct()
    val benchIds = bench.select(col(idCol).as("__id")).distinct()

    // Spread the RAW scan (before any join): Spread.ensure reasons from
    // the file scan's size, so it must wrap the scan itself, not a
    // derived join. Exclude bench ids BEFORE shingling so the anti
    // join moves doc rows, not exploded shingle rows.
    val probe = Spread.ensure(docs.select(col(idCol).as("__id"), col(textCol)))
      .join(broadcast(benchIds), Seq("__id"), "left_anti")
      .withColumnRenamed("__id", idCol)
    shingleRows(probe)
      .join(broadcast(benchShingles), "__s")
      .groupBy(col("__id").as(idCol))
      // shingles are distinct within a document already
      .agg(count(lit(1)).as("n_contaminated"))
  }
}
