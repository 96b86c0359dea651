package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** WordPiece tokenizer — the likelihood-scored third member of the
  * subword-vocabulary triad next to count-greedy BPE ([[Bpe]]) and the
  * probabilistic unigram LM ([[Unigram]]). Two halves, both gated:
  *
  *  - TRAINING (Schuster & Nakajima, "Japanese and Korean voice search",
  *    ICASSP 2012; the BERT tokenizer's vocabulary builder): start from
  *    characters, repeatedly merge the adjacent symbol pair maximizing the
  *    LIKELIHOOD GAIN score count(l,r) / (count(l)·count(r)) — unlike
  *    BPE's raw pair count, this prefers pairs whose parts rarely occur
  *    apart, which is exactly the log-likelihood improvement of the merged
  *    unigram under an independence baseline.
  *  - ENCODING (the WordPiece/BERT runtime rule): greedy LONGEST-MATCH-
  *    FIRST against the trained vocabulary, continuation pieces carrying
  *    the `##` prefix. Encoding depends only on the final vocabulary SET —
  *    deliberately a different algorithm from training's merge replay, and
  *    from BPE's ordered-rule application, so the gate proves both halves
  *    independently.
  *
  * DETERMINISM CONTRACT: the score argmax is on the QUANTIZED score
  * q = ⌊count(l,r)·10¹⁸ / (count(l)·count(r))⌋ computed in exact integer
  * arithmetic (BigInt here, HUGEINT in the oracle — the cross-engine
  * discipline of the repo's rational comparisons), ties broken by (l, r)
  * lexicographic. 10¹⁸ resolution means a q-tie is a genuine numerical
  * near-tie; the quantization exists so both engines pick IDENTICAL merges
  * without trusting float division. Symbol counts are occurrence-weighted
  * over the word vocabulary (count(s) = Σ_words cnt·multiplicity), merged
  * symbols concatenate with the continuation prefix stripped
  * (m = l ++ strip##(r) — the right piece of an in-word adjacency is
  * always a `##` piece).
  *
  * ARCHITECTURE — [[Bpe]]'s driver-finishing discipline verbatim: the
  * distributed part is the corpus scan building the word vocabulary (the
  * whole cost at 100 TB); the merge loop and the 31-distinct-word greedy
  * segmentation are driver-side metadata work under
  * [[Bpe.DriverVocabLimit]], and the encode rejoins the segmentation to
  * the exploded corpus as a broadcastable (word → n_tokens) map — one
  * scan, one aggregation, zero per-merge jobs.
  *
  * Reference behavior studied from public HuggingFace tokenizers docs
  * (WordPiece trainer/model) — no code consulted.
  */
object WordPiece {

  /** Merge budget: below this corpus's exhaustion point (the 31-word
    * vocab admits ~107 adjacent merges), so every gated step is a real
    * scored pick — the empty-pair-count tail is [[Bpe]]'s job to cover. */
  private[operators] val Steps = 48

  /** The score quantizer (see the object scaladoc). */
  private val ScoreScale = BigInt(10).pow(18)

  /** word → (corpus count, WordPiece initial segmentation): first char
    * bare, every later char as a `##`-prefixed continuation piece. */
  private def vocab0(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(
        """transform(sequence(1, length(word)),
          |  i -> if(i = 1, substring(word, 1, 1),
          |          concat('##', substring(word, i, 1))))""".stripMargin))

  /** Exact sequential scored-greedy trainer over collected vocab metadata
    * (the [[Bpe.trainDriver]] shape with the WordPiece pick rule). Returns
    * (step, l, r, merged, pair_count, l_count, r_count) rows. */
  private[operators] def trainDriver(
      init: Array[(String, Long, Array[String])], steps: Int)
      : Seq[(Int, String, String, String, Long, Long, Long)] = {
    var vocab = init
    val merges = Seq.newBuilder[(Int, String, String, String, Long, Long, Long)]
    var k = 1
    var done = false
    while (k <= steps && !done) {
      val pc = scala.collection.mutable.HashMap[(String, String), Long]()
      val sc = scala.collection.mutable.HashMap[String, Long]()
      vocab.foreach { case (_, cnt, syms) =>
        var i = 0
        while (i < syms.length) {
          sc.update(syms(i), sc.getOrElse(syms(i), 0L) + cnt)
          if (i < syms.length - 1) {
            val key = (syms(i), syms(i + 1))
            pc.update(key, pc.getOrElse(key, 0L) + cnt)
          }
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        var bl: String = null; var br: String = null
        var bc = 0L; var bca = 0L; var bcb = 0L
        var bq: BigInt = null
        pc.foreach { case ((l, r), c) =>
          val ca = sc(l); val cb = sc(r)
          val q = BigInt(c) * ScoreScale / (BigInt(ca) * BigInt(cb))
          if (bq == null || q > bq ||
              (q == bq && (l < bl || (l == bl && r < br)))) {
            bl = l; br = r; bc = c; bca = ca; bcb = cb; bq = q
          }
        }
        // the right piece of an in-word adjacency always carries '##'
        val m = bl + br.substring(2)
        merges += ((k, bl, br, m, bc, bca, bcb))
        vocab = vocab.map { case (w, cnt, syms) =>
          (w, cnt, Bpe.applyRule(syms, bl, br, m))
        }
        k += 1
      }
    }
    merges.result()
  }

  /** Greedy longest-match-first segmentation of one word against the
    * vocabulary set (the BERT runtime rule). Initial vocab always holds
    * every single-char piece of the corpus, so no [UNK] branch exists on
    * this corpus — a production encoder adds one. */
  private[operators] def encodeWord(word: String, vocab: Set[String]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val prefix = if (pos == 0) "" else "##"
      var len = word.length - pos
      var found: String = null
      while (len >= 1 && found == null) {
        val cand = prefix + word.substring(pos, pos + len)
        if (vocab(cand)) found = cand else len -= 1
      }
      require(found != null, s"unencodable word '$word' at $pos")
      out += found
      pos += found.length - prefix.length
    }
    out.result()
  }

  /** Collected word vocab (bounded by [[Bpe.DriverVocabLimit]] — the
    * tokenizer-metadata collect discipline; `#` is reserved for the
    * continuation prefix, which the corpus tokenizer guarantees). */
  private def collectVocab(spark: SparkSession, dir: String)
      : Array[(String, Long, Array[String])] = {
    val v = vocab0(spark, dir).localCheckpoint()
    require(v.count() <= Bpe.DriverVocabLimit,
      "word vocab exceeds the driver merge-loop bound")
    val init = v.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getSeq[String](2).toArray))
    require(init.forall(!_._1.contains("#")),
      "corpus words may not contain the '##' continuation prefix char")
    init
  }

  /** The gated merge trajectory: one row per scored merge. */
  def wordpieceTrain(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    trainDriver(collectVocab(spark, dir), Steps)
      .toDF("step", "l_sym", "r_sym", "merged", "pair_count", "l_count",
        "r_count")
      .withColumn("step", col("step").cast("long"))
      .orderBy("step")
  }

  /** Corpus encode: per-document whitespace word count and WordPiece token
    * count under the [[Steps]]-merge vocabulary. The per-distinct-word
    * greedy segmentation is driver metadata; the corpus-sized work is the
    * scan + the (word → n_tokens) join, which AQE broadcasts. */
  def wordpieceEncode(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val init = collectVocab(spark, dir)
    val merges = trainDriver(init, Steps)
    val vocab: Set[String] =
      init.iterator.flatMap(_._3).toSet ++ merges.iterator.map(_._4)
    val seg = init.map { case (w, _, _) =>
      (w, encodeWord(w, vocab).length.toLong)
    }.toSeq.toDF("word", "n_toks")
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(seg), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_toks")).as("n_tokens"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_wordpiece_train" -> (wordpieceTrain _),
    "text_wordpiece_encode" -> (wordpieceEncode _)
  )

  /** Chained-CTE oracle stages (the [[Bpe]] char-oracle formulation, with
    * the scored pick): per stage, pair counts AND occurrence-weighted
    * symbol counts from the previous vocab state, the HUGEINT-quantized
    * score argmax, then the same window-chain merge apply with the
    * continuation prefix stripped off the right piece. */
  private def stageCtes: String = {
    val sb = new StringBuilder
    sb.append(
      """w AS MATERIALIZED (SELECT word, COUNT(*) AS cnt
        |       FROM (SELECT UNNEST(string_split_regex(text, '\s+')) AS word
        |             FROM documents)
        |       WHERE length(word) > 0 GROUP BY 1),
        |v0 AS MATERIALIZED (SELECT word, cnt,
        |         list_transform(range(1, length(word) + 1),
        |           i -> CASE WHEN i = 1 THEN substr(word, 1, 1)
        |                     ELSE '##' || substr(word, i, 1) END) AS syms
        |       FROM w)""".stripMargin)
    for (k <- 1 to Steps) {
      val p = k - 1
      sb.append(s""",
        |pc$k AS (SELECT syms[i] AS l, syms[i+1] AS r, CAST(SUM(cnt) AS BIGINT) AS c
        |        FROM v$p, UNNEST(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
        |sc$k AS (SELECT s, CAST(SUM(cnt) AS BIGINT) AS sc
        |        FROM (SELECT UNNEST(syms) AS s, cnt FROM v$p) GROUP BY 1),
        |b$k AS MATERIALIZED (SELECT p.l, p.r, p.c, a.sc AS ca, b2.sc AS cb
        |        FROM pc$k p JOIN sc$k a ON a.s = p.l JOIN sc$k b2 ON b2.s = p.r
        |        ORDER BY (CAST(p.c AS HUGEINT) * 1000000000000000000)
        |                   // (CAST(a.sc AS HUGEINT) * b2.sc) DESC, p.l, p.r
        |        LIMIT 1),
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
        |          list(CASE WHEN sel = 1
        |                    THEN s || substr((SELECT r FROM b$k), 3) ELSE s END
        |               ORDER BY i) AS syms
        |        FROM c$k WHERE consumed = 0 GROUP BY 1, 2)""".stripMargin)
    }
    sb.toString
  }

  /** The 48-stage chain exceeds DuckDB's default binder depth. */
  private def depthPrefix = "SET max_expression_depth TO 20000;\n"

  val oracle: Map[String, String] = Map(
    "text_wordpiece_train" -> {
      val sels = (1 to Steps).map(k =>
        s"SELECT $k AS step, l AS l_sym, r AS r_sym, l || substr(r, 3) AS merged, " +
          s"c AS pair_count, ca AS l_count, cb AS r_count FROM b$k")
      val groups = sels.grouped(16)
        .map(g => "(" + g.mkString("\n  UNION ALL ") + ")")
        .mkString("\n UNION ALL ")
      s"${depthPrefix}WITH $stageCtes\nSELECT * FROM (\n $groups\n) ORDER BY step"
    },
    // Longest-match encode: the final vocabulary SET (initial pieces ∪
    // merge outputs), a precomputed per-(word, position) longest match,
    // and a linear recursive walk — greedy longest-match is position-
    // independent given the vocab, so the walk needs no aggregates.
    "text_wordpiece_encode" ->
      s"""${depthPrefix}WITH RECURSIVE $stageCtes,
         |vt AS MATERIALIZED (
         |  SELECT DISTINCT s AS tok FROM (SELECT UNNEST(syms) AS s FROM v0)
         |  UNION
         |  SELECT DISTINCT l || substr(r, 3) AS tok FROM (
         |   ${(1 to Steps).map(k => s"SELECT l, r FROM b$k").grouped(16)
                .map(g => "(" + g.mkString(" UNION ALL ") + ")")
                .mkString("\n   UNION ALL ")})),
         |wpos AS (SELECT word, UNNEST(range(1, length(word) + 1)) AS p FROM w),
         |lm AS (SELECT word, p,
         |         MAX(CASE WHEN p = 1 THEN length(tok)
         |                  ELSE length(tok) - 2 END) AS adv
         |       FROM wpos JOIN vt ON
         |         CASE WHEN p = 1
         |              THEN tok NOT LIKE '##%'
         |                   AND substr(word, 1, length(tok)) = tok
         |              ELSE tok LIKE '##%'
         |                   AND substr(word, CAST(p AS INTEGER),
         |                              length(tok) - 2) = substr(tok, 3) END
         |       GROUP BY 1, 2),
         |wk AS (
         |  SELECT word, CAST(1 AS BIGINT) AS p, CAST(0 AS BIGINT) AS ntok FROM w
         |  UNION ALL
         |  SELECT wk.word, wk.p + lm.adv, wk.ntok + 1
         |  FROM wk JOIN lm ON lm.word = wk.word AND lm.p = wk.p
         |  WHERE wk.p <= length(wk.word)),
         |seg AS (SELECT word, ntok FROM wk WHERE p = length(word) + 1),
         |dw AS (SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS word
         |       FROM documents)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(seg.ntok) AS BIGINT) AS n_tokens
         |FROM dw JOIN seg USING (word)
         |WHERE length(word) > 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
