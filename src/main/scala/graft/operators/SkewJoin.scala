package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual escape hatch when AQE's
  * skew-join splitting isn't available or isn't enough (e.g. a single
  * key holding >1 task's worth of rows on the BIG side of a non-broadcast
  * join, which at 100 TB means one straggler task pinning the stage).
  *
  * The big side gets a random-but-deterministic salt in [0, saltFactor);
  * the small side is exploded ×saltFactor so every (key, salt) combination
  * exists. The join key becomes (key, salt) — the hot key's rows now
  * spread over `saltFactor` reducers. Cost: small side replicated
  * ×saltFactor (fine — if it weren't small you'd broadcast or bucket
  * instead).
  *
  * Prefer, in order: broadcast (dim small) → AQE skew join (on by
  * default) → salting (this) → bucketing both sides at write time.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted `saltFactor`
    * ways. The salt is `xxhash64` over the big side's WHOLE ROW — a pure
    * function of row content, so a task retry re-salts each row
    * identically (a positional salt like `monotonically_increasing_id`
    * can change across recomputations of a shuffled input and
    * duplicate/drop rows — the SPARK-23207 failure class). Exact
    * duplicate rows share a salt; that only re-skews if the hot key's
    * rows are near-all identical, in which case dedup first.
    */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 1)
    val saltedBig = big.withColumn(
      "__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val saltedSmall = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
    saltedBig
      .join(saltedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
