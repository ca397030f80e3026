package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and
  * a random-hyperplane LSH bucketed variant as the scale path.
  *
  * Scale design (100 TB): brute force is O(|queries| × |corpus|) — correct
  * as a baseline and fine when the query side is small enough to
  * broadcast (it is here: queries broadcast, corpus streams, no shuffle
  * of the big side; the per-partition top-k is cut by the window only
  * after a partial sort). The LSH path hashes both sides into
  * sign-pattern buckets (Charikar 2002 random hyperplanes) so each query
  * only scores its bucket — candidate volume drops by ~2^bits — at the
  * cost of recall; `probes > 1` re-probes neighboring buckets (one bit
  * flipped) to claw recall back. Everything is seeded/deterministic.
  */
object Similarity {

  /** Dot product of two double arrays (codegen'd HOFs, no UDF). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact brute-force cosine top-k.
    *
    * @param corpus  (idCol, vecCol) big side — streamed, never shuffled
    *                until the final per-query top-k
    * @param queries (idCol, vecCol) small side — broadcast
    * @return (query_id, neighbor_id, cosine, rank), rank 1..k per query,
    *         self-matches excluded, ties broken by neighbor id
    */
  def bruteForceCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    graft.functions.CosineSim.register(corpus.sparkSession)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("__cv"))
    val q = queries.select(
      col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("__qv"))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", expr("cosine_sim(__cv, __qv)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplanes: `bits` planes of dimension
    * `dim`, components in [-1, 1) from a seeded SplitMix64.
    */
  private[operators] def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(bits, dim)(next().toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-pattern LSH bucket id for a vector column. */
  def lshBucket(vecCol: Column, bits: Int, dim: Int, seed: Long = 7L): Column = {
    val planes = hyperplanes(bits, dim, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(toDouble(vecCol), plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF (inverted-file) approximate cosine top-k: a deterministic
    * k-means coarse quantizer assigns every corpus vector to its nearest
    * centroid cell; a query scores only the cells of its `nprobe`
    * nearest centroids. The standard ANN scale path (cf. FAISS IVF):
    * candidate volume ≈ nprobe/k of the corpus, and at 100 TB the corpus
    * can be PARTITIONED BY cell id so a query touches nprobe partitions.
    * Centroids are fit with spark.ml KMeans (fixed seed ⇒ reproducible).
    */
  def ivfCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCells: Int = 16,
      nprobe: Int = 4,
      seed: Long = 7L): DataFrame = {
    graft.functions.CosineSim.register(corpus.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    // cache: KMeans re-scans its input once per iteration (20×), and the
    // assignment transform reads it once more — without this the parquet
    // scan + array conversion reruns 21 times
    val corpusVec = corpus.select(
      col(idCol).as("neighbor_id"),
      toDouble(col(vecCol)).as("__cv"),
      array_to_vector(col(vecCol)).as("__features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new KMeans()
      .setK(numCells).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("__features")
      .fit(corpusVec.select("__features"))
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)

    val c = model
      .transform(corpusVec)
      .withColumnRenamed("prediction", "__cell")
      .select("neighbor_id", "__cv", "__cell")

    // The cache exists for the fit's 20 re-scans, which just completed
    // (fit is eager). Dropping it now means the returned lazy plan
    // re-reads the source once — the same single scan it would do
    // anyway — instead of leaking cached blocks for the session's life.
    corpusVec.unpersist(blocking = false)

    // Query probes: its nprobe nearest centroids under the SAME metric
    // the quantizer assigned with (Euclidean): argmin ‖q−c‖² =
    // argmax (q·c − ‖c‖²/2). Ranking probes by cosine instead would use
    // a different ordering (centroids are not unit-norm) and could skip
    // the very cell a query's neighbors were assigned to.
    val centroidLits = centroids.zipWithIndex.map { case (ctr, i) =>
      struct(
        lit(i).as("cell"),
        (dot(toDouble(col(vecCol)), array(ctr.map(lit): _*)) -
          lit(ctr.map(x => x * x).sum / 2)).as("sim"))
    }
    val q = queries
      .select(
        col(idCol).as("query_id"),
        toDouble(col(vecCol)).as("__qv"),
        slice(array_sort(array(centroidLits: _*),
          (a, b) => when(a.getField("sim") > b.getField("sim"), -1)
            .when(a.getField("sim") < b.getField("sim"), 1).otherwise(0)),
          1, nprobe).as("__probes"))
      .withColumn("__cell", explode(col("__probes").getField("cell")))
      .select("query_id", "__qv", "__cell")

    val scored = c
      .join(broadcast(q), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", expr("cosine_sim(__cv, __qv)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Multi-table LSH approximate cosine top-k: `numTables` independent
    * sign-pattern hash tables (each `bits` hyperplanes); a candidate is
    * any corpus vector sharing a bucket with the query in ANY table —
    * the classic recall amplifier (collision prob 1−(1−p^bits)^L).
    * Candidate volume ≈ L·N/2^bits per query vs N for brute force; the
    * corpus is replicated ×L into (table, bucket) cells — the standard
    * LSH space/recall trade, and the layout that lets a 100 TB corpus be
    * bucket-partitioned so each query touches L partitions instead of
    * all of them.
    */
  def lshCosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 4,
      dim: Int,
      numTables: Int = 8,
      seed: Long = 7L): DataFrame = {
    graft.functions.CosineSim.register(corpus.sparkSession)
    def withBuckets(df: DataFrame, id: String): DataFrame = {
      val tables = (0 until numTables).map { t =>
        struct(
          lit(t).as("tbl"),
          lshBucket(col(vecCol), bits, dim, seed + t).as("bucket"))
      }
      df.select(
        col(idCol).as(id),
        toDouble(col(vecCol)).as(s"__v_$id"),
        explode(array(tables: _*)).as("__cell"))
        .select(col(id), col(s"__v_$id"), col("__cell.tbl"), col("__cell.bucket"))
    }
    val c = withBuckets(corpus, "neighbor_id")
    val q = withBuckets(queries, "query_id")
    val scored = c
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine",
        expr("cosine_sim(__v_neighbor_id, __v_query_id)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
