package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence bench for the image near-dup family (r14 verdict #6:
  * q151 had no scale decade and its corpus was an in-query generator,
  * not a stored one). Generates the SAME deterministic PNG corpus as
  * q151 ([[graft.operators.ImageGen]] — planted within-group near-dups,
  * mixed against cross-group collisions) at several N, STORED two ways:
  *
  *  - `packed`: one parquet table with an opaque `binary` content
  *    column — the multimodal-column layout this engine recommends at
  *    100 TB (blob + typed metadata in columnar files; scan tasks get
  *    splittable, self-describing input);
  *  - `binfile`: N individual .png files under 256 subdirectories,
  *    read through [[graft.sources.RobustSources.binaryBlobs]]
  *    (Spark's binaryFile source) — the layout corpora actually arrive
  *    in. The delta between the two arms at the same N is the price of
  *    per-file listing + open, which is exactly the number that
  *    justifies packing blobs into parquet before heavy processing.
  *
  * Timed arms per point: decode+hash throughput over each layout
  * (pooled thread-local ImageIO reader — the production spelling), the
  * general per-call reader as an A/B at the smallest point (prices the
  * pooled reader's win at corpus scale), and the full q151 pipeline
  * (hash index pinned once, 16-bit-band LSH candidates, Hamming ≤ 6
  * gate) over the packed layout — its growth exponent is the banded
  * join's scale story. Prints ONE JSON line (IMSCALE.json).
  */
object ImageScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("SPARK_GRAFT_IM_NS", "100000,500000,1000000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = BenchHarness.envCpus()
    val spark = BenchHarness.session()
    import spark.implicits._

    def genPacked(n: Int): String = {
      val path = s"/tmp/graft_imscale_$n/blobs.parquet"
      spark.range(n.toLong)
        .repartition(cpus)
        .select(col("id").as("doc_id"))
        .as[Long]
        .map(id => (id, graft.operators.ImageGen.pngFor(id)))
        .toDF("doc_id", "content")
        .write.mode("overwrite").parquet(path)
      path
    }

    def genFiles(n: Int): String = {
      val dir = s"/tmp/graft_imscale_$n/png"
      // marker carries the generator kernel hash (r15 ADVICE): a stale
      // corpus from an older kernel regenerates instead of silently
      // benching different pixels than the packed arm
      val marker = new java.io.File(
        s"$dir/_DONE_${n}_${graft.operators.ImageGen.kernelHash}")
      if (marker.exists()) return dir // file corpora are expensive; reuse
      val d = new java.io.File(dir)
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      (0 until 256).foreach(i => new java.io.File(dir, f"sub_$i%03d").mkdirs())
      spark.range(n.toLong).repartition(cpus).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val sub = f"sub_${id % 256}%03d"
            val f = new java.io.File(s"$dir/$sub/img_$id.png")
            val out = new java.io.FileOutputStream(f)
            try out.write(graft.operators.ImageGen.pngFor(id))
            finally out.close()
          }
        }
      marker.createNewFile()
      dir
    }

    /** decode+hash over a (doc_id, content) frame; one narrow hashed
      * row per image.
      */
    def hashed(blobs: DataFrame, pooled: Boolean): DataFrame = {
      import graft.operators.{ImageHash, MediaCodecs}
      val gray = blobs.as[(Long, Array[Byte])].map { case (id, png) =>
        val img =
          (if (pooled) MediaCodecs.decodeImageIOReused(png)
           else MediaCodecs.decodeImageIO(png))
            .getOrElse(sys.error(s"decode failed for doc $id"))
        (id, (0 until 64).map(j => img.rgb(j * 3) & 0xff))
      }.toDF("doc_id", "gray")
      gray
        .withColumn("tot", ImageHash.graySum(col("gray")))
        .select(
          col("doc_id"),
          ImageHash.aHashLo("gray", "tot").as("lo"),
          ImageHash.aHashHi("gray", "tot").as("hi"),
          ImageHash.dHash("gray").as("dh"))
    }

    /** force full evaluation without materializing wide output */
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // each arm runs once untimed (the first IMSCALE record showed ±70%
    // swings when writeback/warmup landed inside a single timed
    // window), then `reps` timed runs — r15 verdict wrong #2: one
    // sample per arm let "packed is stable" overstate a 1.5× spread;
    // ≥3 samples per arm at the big points carry min/median/max
    def times(reps: Int)(f: => Unit): Seq[Double] = {
      f
      BenchHarness.quiesce(spark)
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
        BenchHarness.quiesce(spark)
        s
      }
    }

    // JIT warmup on a small corpus
    {
      val w = genPacked(2000)
      drain(hashed(spark.read.parquet(w), pooled = true))
      drain(hashed(spark.read.parquet(w), pooled = false))
      val h = hashed(spark.read.parquet(w), pooled = true).localCheckpoint(true)
      drain(graft.operators.ImageHash.bandCandidatePairs(h)
        .filter(graft.operators.ImageHash.hamming(
          col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi")) <= 6)
        .select(col("a_id"), col("b_id")).distinct())
    }

    // generate EVERY corpus before timing ANYTHING: the million-file
    // write's async writeback otherwise lands inside the next timed
    // arm (the first record's non-monotonic hash times); one sync
    // flushes the page cache debt outside all timed windows
    val gens = sizes.map { n =>
      System.err.println(s"[imscale] generating packed @ $n")
      val packed = genPacked(n)
      System.err.println(s"[imscale] generating files @ $n")
      val files = genFiles(n)
      (n, packed, files)
    }
    new ProcessBuilder("sync").start().waitFor()

    val points = gens.map { case (n, packed, files) =>
      val arms = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      // ≥3 timed runs per arm at the points the stability claim is
      // about (500k/1M); the small point keeps single-sample cost
      def rec(name: String)(f: => Unit): Unit = {
        val reps = if (n >= 500000) 3 else 1
        val ts = times(reps)(f).sorted
        System.err.println(f"[imscale] $name @ $n = " +
          ts.map(t => f"$t%.2f").mkString("/") + " s")
        arms += name -> (
          if (reps == 1) f"${ts.head}%.2f"
          else f"""{"min":${ts.head}%.2f,"med":${ts(reps / 2)}%.2f,""" +
            f""""max":${ts.last}%.2f}""")
      }
      rec("hash_packed_pooled") {
        drain(hashed(spark.read.parquet(packed), pooled = true))
      }
      if (n == sizes.head) {
        rec("hash_packed_general") {
          drain(hashed(spark.read.parquet(packed), pooled = false))
        }
        // repeat of the pooled arm AFTER the general one: the first
        // timed arm of a point absorbs residual warmup, so the
        // pooled-vs-general delta is read from this pair, not the first
        rec("hash_packed_pooled2") {
          drain(hashed(spark.read.parquet(packed), pooled = true))
        }
      }
      rec("hash_binfile_pooled") {
        val blobs = graft.sources.RobustSources
          .binaryBlobs(spark, s"$files/sub_*", "*.png")
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
              .cast("long").as("doc_id"),
            col("content"))
        drain(hashed(blobs, pooled = true))
      }
      rec("neardup_packed") {
        val h = hashed(spark.read.parquet(packed), pooled = true)
          .localCheckpoint(true) // the q151 two-consumer pin
        drain(graft.operators.ImageHash.bandCandidatePairs(h)
          .filter(graft.operators.ImageHash.hamming(
            col("a_lo"), col("a_hi"), col("b_lo"), col("b_hi")) <= 6)
          .select(col("a_id"), col("b_id")).distinct())
      }
      (n, arms.toSeq)
    }
    val json = points.map { case (n, ts) =>
      val qs = ts.map { case (q, s) => s""""$q":$s""" }.mkString(",")
      s"""{"n_images":$n,$qs}"""
    }.mkString("[", ",\n ", "]")
    println(s"""{"metric":"image_scale","points":$json}""")
    spark.stop()
  }
}
