package graft

/** One TEXTSCALE measurement in a FRESH JVM — the isolate arm
  * (r13 verdict #6). The light-to-heavy sweep ordering keeps spillers
  * from contaminating downstream queries, but it makes every number
  * order-dependent by construction; this main gives any query an
  * order-independent reading: new JVM (no residual heap/JIT/page-cache
  * state from a 30 GB digest-sort spill), warmup on the small corpus
  * (JIT parity with the in-sweep numbers, whose JVM is warm), quiesce,
  * ONE timed run, ONE JSON line on stdout.
  *
  * args: queryName dir warmDir ohaFallbackThreshold
  * Spawned by [[TextScaleBench]] with the parent JVM's own input
  * arguments (same -Xmx, add-opens, -D props), so the only variable is
  * the isolation itself.
  */
object TextScaleOne {
  def main(args: Array[String]): Unit = {
    val Array(q, dir, warmDir, oha) = args
    val spark = BenchHarness.session()
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", oha)
    val fn = TextArms.fn(q)
    // JIT/classload warmup on the small corpus, exactly like the sweep
    fn(spark, warmDir).write.format("noop").mode("overwrite").save()
    BenchHarness.quiesce(spark)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"q":"$q","sec":$sec%.2f}""")
    spark.stop()
  }
}
