package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed byte-pair-encoding tokenizer training (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the canonical subword-vocabulary step of an LLM data
  * pipeline, run as Spark aggregations instead of the single-machine
  * reference implementation.
  *
  * Training operates on the WORD VOCABULARY (word → corpus count), never
  * the corpus itself: the corpus is scanned once to build the vocab, and
  * every merge iteration is (1) a distributed weighted pair-count over the
  * vocab's symbol arrays, (2) a single argmax row collected to the driver
  * (bounded metadata, like the k-means/PQ codebooks), and (3) a
  * distributed greedy merge-apply over the symbol arrays. At 100 TB the
  * vocab is orders of magnitude smaller than the corpus and the per-merge
  * cost is proportional to the vocab, not the data.
  *
  * The greedy merge-apply is a left fold: the pair (l, r) merges at the
  * earliest opportunity and the merged symbol never re-merges with the
  * following symbol in the same step (exactly the reference BPE's
  * left-to-right non-overlapping scan; for runs like `aaaa` under merge
  * (a,a) this yields `[aa][aa]`, and `aaa` yields `[aa][a]`). The DuckDB
  * oracle reproduces the same greedy semantics through a window-function
  * formulation (chain parity selection), so the gate proves the two
  * independent formulations agree on every word.
  */
object Bpe {

  /** Merge iterations. Small by design: each step is exactly gated, and 10
    * steps already exercise multi-char symbol merges on this corpus. */
  private val Steps = 10

  private def lit1(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

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

  /** Greedy left-to-right merge of (l, r) → lr in a symbol array, as a
    * fold: merge when the accumulator's last symbol is l and the incoming
    * is r; a just-merged `lr` can never cascade because `lr` ≠ l. */
  private def mergeExpr(l: String, r: String) = expr(
    s"aggregate(syms, cast(array() as array<string>), (acc, x) -> " +
      s"case when size(acc) > 0 and try_element_at(acc, -1) = ${lit1(l)} " +
      s"and x = ${lit1(r)} " +
      s"then concat(slice(acc, 1, size(acc) - 1), array(${lit1(l + r)})) " +
      s"else concat(acc, array(x)) end)")

  /** Runs the merge loop: returns the merge table rows and the final
    * vocab (lazily recomputable after the base cache is released). Ties
    * in pair counts break deterministically by (count desc, l, r). */
  private def train(spark: SparkSession, dir: String)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val base = vocab0(spark, dir).persist()
    var vocab = base
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var k = 1
    var done = false
    while (k <= Steps && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k, l, r, l + r, c))
        vocab = vocab.withColumn("syms", mergeExpr(l, r))
        k += 1
      }
    }
    base.unpersist()
    (merges.result(), vocab)
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

  /** The merge loop unrolled: stage k computes pair counts p_k from vocab
    * v_{k-1}, the argmax pair b_k, and the merged vocab v_k via the
    * window-function greedy selection (positions matching the pair are
    * grouped into overlap chains; every other chain member starting from
    * the chain head merges — provably the same set the left fold merges). */
  private def stageCtes: String = {
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, and
    // every v_k is referenced twice (pair counts + merge apply) — without
    // materialization the v10 expansion contains 2^10 copies of the
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
