package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed byte-pair-encoding tokenizer training (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the canonical subword-vocabulary step of an LLM data
  * pipeline, run as Spark aggregations instead of the single-machine
  * reference implementation.
  *
  * Training operates on the WORD VOCABULARY (word → corpus count), never
  * the corpus itself: the corpus is scanned once to build the vocab, the
  * pair counts are aggregated IN FULL exactly once, and every training
  * ROUND is (1) one driver round-trip that collects the
  * top-[[CandidateBatch]] candidate pairs from the standing counts
  * (bounded metadata, like the k-means/PQ codebooks), (2) a distributed
  * merge-apply over the symbol arrays, and (3) a DELTA re-aggregation of
  * pair counts over only the words the batch changed (see
  * [[trainBatched]]). At 100 TB the vocab is orders of magnitude smaller
  * than the corpus, and per-round cost tracks the accepted merges'
  * footprint, not even the vocabulary size.
  *
  * BATCHED GREEDY SELECTION — the round-trip economics: a naive greedy
  * loop runs one full distributed job per merge (a 32k-merge production
  * vocab = 32k sequential Spark jobs, scheduler-bound for days). Instead
  * each round accepts the longest sorted prefix of candidates that is
  * PROVABLY the next run of sequential-greedy picks, so the job count is
  * merges/batch — sublinear in merges — while the selected merge sequence
  * (and each merge's recorded pair count) is bit-identical to the
  * one-at-a-time loop (BpeBatchSpec proves it against the maxAccept = 1
  * path; the DuckDB oracle re-derives the same sequence with fully
  * sequential per-step argmax CTEs). A candidate p_i (count c_i) after
  * accepted merges p_1..p_{i-1} is safe to accept when:
  *
  *  - SYMBOL-DISJOINT: {l_i, r_i, l_i+r_i} shares nothing with any
  *    accepted {l_k, r_k, l_k+r_k}. Merging (l_k, r_k) cannot change the
  *    count of a disjoint pair (neither endpoint is consumed, and new
  *    adjacencies all involve the merged symbol), so c_i is still p_i's
  *    exact current count when its turn comes.
  *  - ABOVE THE HAZARD BOUND: c_i is strictly greater than every
  *    batch-count of a pair that CONFLICTS with an accepted merge, and
  *    strictly greater than the truncation sentinel (the last collected
  *    count) when the batch didn't cover all pairs. Any pair the earlier
  *    merges might have newly created or re-ranked has count bounded by
  *    some conflicting pair's old count (a new pair (x, l_k r_k) arises
  *    only where (x, l_k) was adjacent, etc.), so nothing can outrank
  *    p_i at selection time; ties are excluded by strictness because a
  *    new pair's key is unknowable without replaying the merge.
  *
  * The first candidate is always exact (top-1 of the sorted batch is the
  * global argmax whatever the truncation). Acceptance stops at the first
  * violation, the accepted rules apply in ONE fold pass (disjointness
  * makes simultaneous = sequential application), and the next round
  * recounts distributed — so batching never changes WHAT is learned,
  * only how many driver round-trips learning costs.
  *
  * The greedy merge-apply is a left fold: a pair merges at the earliest
  * opportunity and the merged symbol never re-merges with the following
  * symbol in the same step (exactly the reference BPE's left-to-right
  * non-overlapping scan; for runs like `aaaa` under merge (a,a) this
  * yields `[aa][aa]`, and `aaa` yields `[aa][a]` — a batch rule can never
  * consume another batch rule's output because outputs are
  * disjointness-checked like inputs). The DuckDB oracle reproduces the
  * same greedy semantics through a window-function formulation (chain
  * parity selection), so the gate proves the two independent
  * formulations agree on every word.
  */
object Bpe {

  /** Merge count. Raised from the early 10-step proof-of-semantics to 64
    * so the batched selection actually exercises multi-merge rounds;
    * every step is still exactly gated. */
  private val Steps = 64

  /** Candidate rows collected per round — bounded driver metadata. More
    * candidates = bigger accepted batches = fewer rounds; the safety
    * argument is independent of the size. */
  private val CandidateBatch = 256

  /** word → (corpus count, initial char-level symbol array). */
  private def vocab0(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Weighted adjacent-pair counts over the vocab's symbol arrays. The
    * zip_with-of-slices form emits no rows for single-symbol words and
    * keeps the whole pair extraction inside one codegen'd projection. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"), explode(expr(
      "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1), " +
        "(a, b) -> named_struct('l', a, 'r', b))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** One-pass greedy left-to-right application of a DISJOINT rule batch:
    * merge when (accumulator's last symbol, incoming symbol) is a rule
    * key; a just-merged output can never cascade because rule outputs are
    * disjoint from all rule inputs in the same batch. The key separator
    * is NUL, which whitespace-split words cannot contain. */
  private def batchMergeExpr(accepted: Seq[(String, String, Long)]): Column = {
    val rules = map(accepted.flatMap { case (l, r, _) =>
      Seq(lit(l + "\u0000" + r), lit(l + r))
    }: _*)
    aggregate(
      col("syms"),
      expr("cast(array() as array<string>)"),
      (acc, x) => {
        val merged = try_element_at(rules,
          concat_ws("\u0000", try_element_at(acc, lit(-1)), x))
        when(merged.isNotNull,
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(x)))
      })
  }

  /** The maximal sorted-prefix batch that provably equals the next run of
    * sequential-greedy selections (see the object scaladoc for the
    * invariant). `truncated` = the collected batch may not contain every
    * pair, so unseen counts are bounded by the last collected count. */
  private def selectBatch(
      cands: Array[(String, String, Long)],
      truncated: Boolean,
      maxAccept: Int): Seq[(String, String, Long)] = {
    if (cands.isEmpty) return Seq.empty
    val accepted = Seq.newBuilder[(String, String, Long)]
    val acceptedSyms = scala.collection.mutable.HashSet[String]()
    var nAccepted = 0
    var hazard = if (truncated) cands.last._3 else -1L
    def conflicts(l: String, r: String, m: String): Boolean =
      acceptedSyms(l) || acceptedSyms(r) || acceptedSyms(m)
    var i = 0
    var stop = false
    while (i < cands.length && !stop && nAccepted < maxAccept) {
      val (l, r, c) = cands(i)
      val m = l + r
      val safe =
        if (nAccepted == 0) true // global argmax is exact at any truncation
        else !conflicts(l, r, m) && c > hazard
      if (!safe) stop = true
      else {
        accepted += ((l, r, c))
        nAccepted += 1
        acceptedSyms ++= Seq(l, r, m)
        // fold every remaining candidate that touches this merge's symbols
        // into the hazard bound — their (old) counts cap anything the
        // merge may create or re-rank
        var j = i + 1
        while (j < cands.length) {
          val q = cands(j)
          if (q._1 == l || q._1 == r || q._1 == m ||
              q._2 == l || q._2 == r || q._2 == m)
            hazard = math.max(hazard, q._3)
          j += 1
        }
      }
      i += 1
    }
    accepted.result()
  }

  /** Per-round instrumentation snapshot (test-only, see
    * [[trainBatchedImpl]]): rows fed to the DELTA aggregation vs the rows
    * a full recount would aggregate, plus driver-side copies of the
    * standing counts and the post-merge vocab so a spec can prove the
    * delta-maintained counts equal an independent full recount. */
  private[graft] case class RoundProbe(
      deltaPairRows: Long,
      fullPairRows: Long,
      counts: Array[(String, String, Long)],
      vocab: Array[(String, Long, Vector[String])])

  /** Runs the batched merge loop with DELTA-MAINTAINED pair counts:
    * returns the merge table rows, the final vocab, and the number of
    * distributed selection rounds (the job count the batching exists to
    * shrink). `maxAccept = 1` degenerates to the classic
    * one-merge-per-job sequential loop — the differential baseline
    * BpeBatchSpec compares against. Ties in pair counts break
    * deterministically by (count desc, l, r) exactly as before.
    *
    * DELTA MAINTENANCE — the full-scan economics: the standing pair
    * counts are built ONCE from the initial vocab; every round after
    * applies the accepted batch, finds the words whose symbol arrays
    * actually CHANGED (`newSyms <> syms` — only words containing an
    * accepted pair), and re-aggregates pairs over that changed subset
    * twice (old arrays negated, new arrays positive). The standing
    * counts absorb the deltas through one small hash agg and drop
    * zeroed pairs. Because adjacent-pair counts are a per-word local
    * quantity, (standing + delta) is EXACTLY the full recount — the
    * candidate collection sees bit-identical (l, r, c) rows, so the
    * learned merge table is unchanged (BpeBatchSpec proves per-round
    * count equality against a driver recompute, and the DuckDB oracle
    * still re-derives everything sequentially). As the vocab converges,
    * the changed fraction shrinks toward the accepted pairs' support, so
    * per-round aggregation cost drops with convergence instead of
    * re-paying Σ|syms| every round — at a 32k-merge production vocab the
    * recount work tracks the merges' footprint, not the vocabulary size.
    *
    * Iteration hygiene: vocab and counts are `localCheckpoint`ed each
    * round — both are vocabulary-sized metadata (≪ corpus at any scale),
    * and truncating lineage keeps round N's plan O(1) instead of O(N)
    * (the standard cadence for iterative Spark algorithms; a cluster
    * deployment would use reliable checkpoints at the same points). */
  private[graft] def trainBatched(
      spark: SparkSession, dir: String, maxAccept: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame, Int) = {
    val (merges, vocab, rounds, _) = trainBatchedImpl(spark, dir, maxAccept, instrument = false)
    (merges, vocab, rounds)
  }

  /** [[trainBatched]] plus per-round [[RoundProbe]]s (extra count/collect
    * jobs — test-only). */
  private[graft] def trainBatchedImpl(
      spark: SparkSession, dir: String, maxAccept: Int, instrument: Boolean)
      : (Seq[(Int, String, String, String, Long)], DataFrame, Int, Seq[RoundProbe]) = {
    var vocab = vocab0(spark, dir).localCheckpoint()
    // The ONE full pair-count; every later round maintains it by delta.
    var counts = pairCounts(vocab).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    val probes = Seq.newBuilder[RoundProbe]
    var k = 1
    var rounds = 0
    var done = false
    while (k <= Steps && !done) {
      val cands = counts
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(CandidateBatch).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      rounds += 1
      val batch = selectBatch(cands, cands.length == CandidateBatch,
        math.min(maxAccept, Steps - k + 1))
      if (batch.isEmpty) done = true
      else {
        batch.foreach { case (l, r, c) =>
          merges += ((k, l, r, l + r, c))
          k += 1
        }
        val merged = vocab.withColumn("newSyms", batchMergeExpr(batch))
          .localCheckpoint()
        val changed = merged.filter(col("newSyms") =!= col("syms"))
        val deltas = pairCounts(
          changed.select(negate(col("cnt")).as("cnt"), col("syms"))
            .union(changed.select(col("cnt"), col("newSyms").as("syms"))))
        counts = counts.union(deltas)
          .groupBy("l", "r").agg(sum(col("c")).as("c"))
          .filter(col("c") > 0)
          .localCheckpoint()
        vocab = merged.select(col("word"), col("cnt"), col("newSyms").as("syms"))
        if (instrument) {
          val Array(deltaRows) = changed.select(
            coalesce(sum(greatest(size(col("syms")) - 1, lit(0))
              + greatest(size(col("newSyms")) - 1, lit(0))), lit(0L)).as("d"))
            .collect().map(_.getLong(0))
          val Array(fullRows) = vocab.select(
            coalesce(sum(greatest(size(col("syms")) - 1, lit(0))), lit(0L)).as("f"))
            .collect().map(_.getLong(0))
          probes += RoundProbe(
            deltaRows, fullRows,
            counts.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))),
            vocab.collect().map(r =>
              (r.getString(0), r.getLong(1), r.getSeq[String](2).toVector)))
        }
      }
    }
    (merges.result(), vocab, rounds, probes.result())
  }

  private def train(spark: SparkSession, dir: String)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val (merges, vocab, _) = trainBatched(spark, dir, CandidateBatch)
    (merges, vocab)
  }

  /** The learned merge table: (step, l_sym, r_sym, merged, pair_count). */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, _) = train(spark, dir)
    merges.toDF("step", "l_sym", "r_sym", "merged", "pair_count")
      .orderBy("step")
  }

  /** Tokenize the corpus with the learned merges: per-doc word and BPE
    * token counts. The token count per WORD comes from the final vocab
    * (one row per distinct word), joined back to the exploded corpus —
    * the standard "encode via vocab lookup" path; Spark picks
    * broadcast vs shuffle by vocab size. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, vocab) = train(spark, dir)
    val tok = vocab.select(col("word"), size(col("syms")).cast("long").as("n_toks"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(tok, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_tokens"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_merges" -> (bpeMerges _),
    "text_bpe_encode" -> (bpeEncode _)
  )

  /** The merge loop unrolled SEQUENTIALLY (one argmax per step — the
    * oracle never batches, so the gate independently proves the batched
    * selection equals per-step greedy): stage k computes pair counts p_k
    * from vocab v_{k-1}, the argmax pair b_k, and the merged vocab v_k
    * via the window-function greedy selection (positions matching the
    * pair are grouped into overlap chains; every other chain member
    * starting from the chain head merges — provably the same set the
    * left fold merges). */
  private def stageCtes: String = {
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, and
    // every v_k is referenced twice (pair counts + merge apply) — without
    // materialization the v64 expansion contains 2^64 copies of the
    // documents scan and the oracle dies on file handles.
    sb.append(
      """w AS MATERIALIZED (SELECT word, COUNT(*) AS cnt
        |       FROM (SELECT UNNEST(string_split_regex(text, '\s+')) AS word
        |             FROM documents)
        |       WHERE length(word) > 0 GROUP BY 1),
        |v0 AS MATERIALIZED (SELECT word, cnt,
        |         list_transform(range(1, length(word) + 1),
        |           i -> substr(word, i, 1)) AS syms FROM w)""".stripMargin)
    for (k <- 1 to Steps) {
      val p = k - 1
      sb.append(s""",
        |p$k AS (SELECT syms[i] AS l, syms[i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS c
        |        FROM v$p, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
        |e$k AS (SELECT word, cnt, i, syms[i] AS s,
        |          CASE WHEN i < len(syms) AND syms[i] = (SELECT l FROM b$k)
        |                AND syms[i+1] = (SELECT r FROM b$k) THEN 1 ELSE 0 END AS m
        |        FROM v$p, UNNEST(range(1, len(syms) + 1)) AS u(i)),
        |r$k AS (SELECT *, SUM(1 - m) OVER (PARTITION BY word ORDER BY i) AS runid
        |        FROM e$k),
        |s$k AS (SELECT *, CASE WHEN m = 1 AND (i - MIN(CASE WHEN m = 1 THEN i END)
        |          OVER (PARTITION BY word, runid)) % 2 = 0 THEN 1 ELSE 0 END AS sel
        |        FROM r$k),
        |c$k AS (SELECT *, COALESCE(LAG(sel) OVER (PARTITION BY word ORDER BY i), 0)
        |          AS consumed FROM s$k),
        |v$k AS MATERIALIZED (SELECT word, cnt,
        |          list(CASE WHEN sel = 1 THEN s || (SELECT r FROM b$k) ELSE s END
        |               ORDER BY i) AS syms
        |        FROM c$k WHERE consumed = 0 GROUP BY 1, 2)""".stripMargin)
    }
    sb.toString
  }

  val oracle: Map[String, String] = Map(
    "text_bpe_merges" -> {
      val rows = (1 to Steps).map(k =>
        s"SELECT $k AS step, l AS l_sym, r AS r_sym, l || r AS merged, c AS pair_count FROM b$k")
        .mkString("\n  UNION ALL ")
      s"WITH $stageCtes\nSELECT * FROM (\n  $rows\n) ORDER BY step"
    },
    "text_bpe_encode" ->
      s"""WITH $stageCtes,
         |dw AS (SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS word
         |       FROM documents)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(len(syms)) AS BIGINT) AS n_tokens
         |FROM dw JOIN v$Steps USING (word)
         |WHERE length(word) > 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
