package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":...,"value":total_sec,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is fully materialized through the `noop` sink (not just
  * counted) so sorts, projections and sinks are paid, matching what a real
  * consumer of the result would observe.
  */
object Bench {
  @volatile private var calibSink: Long = 0L

  /** Fixed single-thread calibration spin: 2^28 sequentially-dependent
    * xorshift64 steps (each step reads the last one's output, so the JIT
    * can neither fold the loop to a closed form nor vectorize it; the
    * volatile sink keeps it live). On an unloaded core this takes a stable
    * ~0.3-0.8 s; under host CPU-steal it inflates proportionally. Timed at
    * checkpoints through the run and emitted as `calib_s` in the bench
    * JSON, it makes a steal-polluted artifact machine-detectable: rounds
    * 4-8 all produced driver bench numbers 30%+ above a converged rerun on
    * identical code (r8: 288 s vs 217 s) with nothing in the artifact to
    * tell a consumer. Compare the series' max to its min — a clean run is
    * flat; a ratio well above ~1.3 marks the window where timings are
    * untrustworthy.
    */
  private def calibSpin(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < (1 << 28)) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    calibSink = x
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Tables.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup for one-time JVM statics. The first executed upper()/
    // lower() triggers CollationAwareUTF8String.<clinit> — Spark 4's ICU
    // collation-table load — which costs 5-15 s once per JVM (per executor
    // on a real cluster, amortized over the job). Paying it inside whichever
    // query happens to run first skewed that query's number by >10x
    // (observed via jstack: ICU UCharacter.toTitleCase under
    // CollationSupport.Upper.execBinaryICU on the first fn_string task).
    spark.range(1)
      .selectExpr("upper('a') u", "lower('A') l", "initcap('a b') i",
        "regexp_replace('a','a','b') r", "split('a,b', ',') s")
      .write.format("noop").mode("overwrite").save()
    // Per-query CONVERGED time = min over the reps AFTER the first: rep 1
    // pays per-query JIT compilation and is also exposed to the host's
    // episodic CPU-steal bursts (observed 3-10x swings on identical code
    // between consecutive runs; round 5's three "regressions" were all
    // first-rep artifacts that converged re-runs dismissed). The first-run
    // time is still reported alongside ("queries_first") so cold-path cost
    // stays visible, but the headline total is quoted on converged reps.
    // Default 3 reps (1 warmup + min-of-2); override via SPARK_GRAFT_BENCH_REPS.
    val reps = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt, 1)
    val qseq = SparkEntry.queries.toSeq.sortBy(_._1)
    // Steal-calibration checkpoints: one spin before the first query, one
    // after every ~10% of the list, one after the last — an 11-point
    // time-series over the whole run (~5 s total overhead at 0.5 s/spin).
    val calibEvery = math.max(1, qseq.length / 10)
    val calibs = scala.collection.mutable.ArrayBuffer[Double](calibSpin())
    val results = qseq.zipWithIndex.map { case ((name, fn), qi) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      if ((qi + 1) % calibEvery == 0 || qi == qseq.length - 1) calibs += calibSpin()
      val first = times.head._1
      val converged = if (reps > 1) times.tail.map(_._1).min else first
      (name, first, converged, times.forall(_._2))
    }
    val qs = results.map { case (k, _, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val qsFirst = results.map { case (k, v, _, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    // A failing query's near-zero "timing" must not masquerade as a healthy
    // fast run: list failures explicitly so the JSON is self-reporting.
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._3).sum
    val totalFirst = results.map(_._2).sum
    // The complete per-query converged timings print FIRST on their own
    // line: a consumer that truncates or tails the output still gets every
    // query's number from one parseable line (the round-6 bench artifact
    // lost ~2/3 of per-query timings to tail truncation of the single
    // giant headline line). First-run timings follow on their own line.
    // The HEADLINE (final line, what a 2000-char tail keeps) stays small
    // by embedding only the top-20 slowest converged queries — the full
    // 265-query map made the final line ~7 KB, so a tail window lost most
    // of it AND the leading brace, leaving nothing parseable. The key is
    // "top20_queries", NOT "queries": a truncated map under the full-map
    // key would let a stale parser silently read 20 entries as the
    // complete set (the full map is the per_query_converged line).
    val top20 = results.sortBy(-_._3).take(20)
      .map { case (k, _, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val calibJson = calibs.map(c => f"$c%.3f").mkString("[", ",", "]")
    val calibRatio = if (calibs.nonEmpty && calibs.min > 0) calibs.max / calibs.min else 1.0
    println(s"""{"metric":"per_query_converged","queries":$qs}""")
    println(s"""{"metric":"per_query_first","queries":$qsFirst}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","first_run_total":$totalFirst%.3f,"n_queries":${results.length},"top20_queries":$top20,"failed":$failed,"calib_s":$calibJson,"calib_max_over_min":$calibRatio%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
