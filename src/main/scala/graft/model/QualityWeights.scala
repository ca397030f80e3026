package graft.model

/** Frozen logistic-regression weights for the q77 quality-model scoring
  * pass — the md5-anchor discipline applied to a trained model: training
  * (iterative L-BFGS, not SQL-replayable) runs ONCE offline via
  * [[QualityWeightsTrainer]]; the learned coefficients are persisted
  * here as plain constants; the scoring pass is then a pure
  * deterministic expression over them, hash-checked against a DuckDB
  * replay. Training quality itself stays pinned by accuracy-floor specs
  * (`QualityModelSpec`) — the oracle checks the SCORING semantics, the
  * spec checks the LEARNING.
  *
  * Feature space (identical in trainer, scorer and oracle):
  *  - 256 md5-bucketed bag-of-words counts: token t contributes 1 to
  *    bucket `conv(substring(md5(t),1,4),16,10) % 256` — the repo's
  *    standard cross-engine hash gate (cf. [[graft.operators.ProductQuantizer]]),
  *    chosen over spark.ml HashingTF precisely because murmur3 is not
  *    replayable in ANSI SQL;
  *  - 5 document statistics: n_words, n_words**2, mean_word_len,
  *    mean_word_len**2, stop_hits (the Gopher-rule signal columns).
  *
  * Provenance: [[QualityWeightsTrainer]] on
  * `/root/testdata/sf0.01/documents.parquet`, maxIter 50, reg 1e-4;
  * training accuracy at /root/testdata/sf0.01: 0.884 over 500 docs.
  * Scoring generalizes across SFs (the weights are just a hyperplane);
  * regenerate only when the feature space changes.
  */
object QualityWeights {
  val numBuckets: Int = 256

  val textW: Array[Double] = Array(
    0.37741634658534606, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.34050188409370263,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.47110942539564693,
    0.28594965633097386, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.38975973510196255, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.31832192121338265, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.38084061138578074, 0.0, 0.0, 0.0,
    0.0, 0.5958218796874676, 0.0, 0.0765870230762123,
    0.0, 0.2147931420361242, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.4949664170323613, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.43143257705635535,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.5227763171274146, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.5951207797441782, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.9883300016738462,
    0.0, 0.4310697651978628, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.1689047032295911, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.5195491462520897, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.20650607360013448, 0.0, 0.0, 0.0,
    0.12096748319324153, 0.1400672967615174, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.6395833994708278, 0.0, 0.0,
    0.4440582434043473, 0.0, 0.0, 0.0,
    0.0, 0.24532881884857805, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.45723845719565603, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.6472798851528822, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.5570032444624599, 0.0, 0.0,
    -0.3618901049352769, 0.0, 0.0, 0.0,
    0.0, 0.4401958350193908, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0,
    0.0, 0.14965201065701778, 0.0, 0.0)
  val statW: Array[Double] = Array(
    0.04176848086406989, -0.003588534763085469,
    37.190972275426425, -5.127938136044765,
    1.159879282439471)
  val intercept: Double = -73.28321089123052
}
