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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
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
    // of it AND the leading brace, leaving nothing parseable.
    val top20 = results.sortBy(-_._3).take(20)
      .map { case (k, _, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"per_query_converged","queries":$qs}""")
    println(s"""{"metric":"per_query_first","queries":$qsFirst}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","first_run_total":$totalFirst%.3f,"n_queries":${results.length},"queries":$top20,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
