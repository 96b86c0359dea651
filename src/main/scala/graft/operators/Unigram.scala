package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Unigram-LM subword segmentation (Kudo, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates", ACL 2018) — the SentencePiece-family tokenizer that
  * complements [[Bpe]]: instead of learning merges bottom-up, it scores a
  * seed piece inventory and segments each word by VITERBI — the maximal
  * total-piece-score decomposition. This is the third tokenizer family in
  * the pillar (char BPE, phrase BPE, unigram), and it exercises the one
  * shape BPE never does: per-word dynamic programming under a broadcast
  * model.
  *
  * ARCHITECTURE (the 100 TB story, mirroring [[Bpe]]'s driver-finishing
  * design): the distributed part is the corpus — one scan builds the
  * word vocabulary (word → corpus count) and one bounded explode of that
  * vocabulary (≤ L·[[Unigram.MaxPieceLen]] pieces per DISTINCT word, never
  * per occurrence) aggregates the piece counts. The scored piece
  * inventory is model metadata — bounded by the corpus alphabet to the
  * ≤[[Unigram.MaxPieceLen]]-gram space actually present, the same
  * ≪-driver-memory regime as BPE's word vocab — so it collects and
  * broadcasts, and segmentation runs embarrassingly parallel over the
  * distinct-word table: O(L·MaxPieceLen) map lookups per word, no
  * shuffle, no iteration. Applying the segmentation to the full corpus
  * is then a broadcast join of the segmented vocab against the token
  * stream — the standard train-on-vocab / apply-to-corpus split of every
  * production tokenizer.
  *
  * DETERMINISM: piece scores are the engine's half-bit integer log
  * quantization (`length(bin(cnt²))` = ⌊2·log₂ cnt⌋ + 1 — libm-free, the
  * ta_lm_score discipline), so the DP objective is exact BIGINT
  * arithmetic; ties on total score break to the LONGER final piece,
  * which makes the argmax unique (same score + same length ⇒ same
  * piece). Every single-character piece is kept unconditionally
  * (segmentability guarantee — exactly SentencePiece's required-char
  * rule); multi-char pieces need corpus support ≥ [[Unigram.MinPieceCount]].
  *
  * The DuckDB oracle re-derives the identical model and runs the same DP
  * as a [[Unigram.OracleMaxLen]]-stage chained-CTE forward pass (stage i
  * joins stages i−1…i−MaxPieceLen against the piece table and takes the
  * per-word (score, piece-length) argmax) — a deliberately different
  * formulation from the Scala array-walk, so the gate cross-checks the
  * recurrence itself, not one implementation.
  */
object Unigram {

  /** Longest piece considered (SentencePiece's default max piece length
    * is 16; 4 matches this corpus's 8-char words — two pieces cover any
    * word even in the worst case). */
  val MaxPieceLen = 4

  /** Corpus support needed for a multi-char piece to enter the
    * inventory; single chars are always kept (segmentability). */
  val MinPieceCount = 3L

  /** DP stages unrolled in the oracle SQL — a safe bound above the
    * corpus's max word length (8 at both gate scales); stages beyond the
    * longest word are empty and cost nothing. */
  val OracleMaxLen = 16

  /** UDF result row; public because the generated encoder code must be
    * able to reference the class and its accessors. */
  case class SegResult(seg: String, n_pieces: Long, total_score: Long)

  /** Viterbi over one word under the broadcast score map: best(i) =
    * max over k ≤ min(i, MaxPieceLen), piece = w[i−k, i) ∈ V of
    * best(i−k) + score(piece); ties prefer larger k. */
  private[operators] def viterbi(w: String, score: collection.Map[String, Long]): SegResult = {
    val L = w.length
    val best = Array.fill(L + 1)(Long.MinValue)
    val backK = new Array[Int](L + 1)
    best(0) = 0L
    var i = 1
    while (i <= L) {
      var k = 1
      while (k <= MaxPieceLen && k <= i) {
        if (best(i - k) != Long.MinValue) {
          score.get(w.substring(i - k, i)) match {
            case Some(s) =>
              val cand = best(i - k) + s
              if (cand > best(i) || (cand == best(i) && k > backK(i))) {
                best(i) = cand
                backK(i) = k
              }
            case None => ()
          }
        }
        k += 1
      }
      i += 1
    }
    val pieces = List.newBuilder[String]
    var j = L
    var n = 0L
    while (j > 0) {
      pieces += w.substring(j - backK(j), j)
      n += 1
      j -= backK(j)
    }
    SegResult(pieces.result().reverse.mkString(" "), n, best(L))
  }

  /** Distinct-word vocabulary with corpus counts (the distributed scan). */
  private def wordVocab(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Per-word Viterbi segmentation under the corpus-trained unigram
    * inventory: (word, freq, n_pieces, total_score, seg). */
  def unigramViterbi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = wordVocab(spark, dir).localCheckpoint()
    val scores = vocab
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), s ->
           |  transform(sequence(1, least($MaxPieceLen, length(word) - s + 1)),
           |    k -> substring(word, s, k))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .filter(length(col("piece")) === 1 || col("cnt") >= MinPieceCount)
      .select(col("piece"), length(bin(col("cnt") * col("cnt"))).cast("long").as("sc"))
      .as[(String, Long)]
      .collect()
      .toMap
    val bc = spark.sparkContext.broadcast(scores)
    val seg = udf((w: String) => viterbi(w, bc.value))
    vocab
      .select(col("word"), col("freq"), seg(col("word")).as("r"))
      .select(col("word"), col("freq"), col("r.n_pieces"),
        col("r.total_score"), col("r.seg"))
      .orderBy("word")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_viterbi" -> (unigramViterbi _)
  )

  /** One forward-DP stage of the oracle: rows ending at position i via a
    * final piece of length k come from stage i−k; the per-word argmax is
    * (total score DESC, k DESC). MATERIALIZED is load-bearing — each
    * stage is referenced by up to [[MaxPieceLen]] later stages. */
  private def dpStageSql(i: Int): String = {
    val members = (1 to math.min(MaxPieceLen, i)).map { k =>
      s"""SELECT word, freq, best, np, seg, $k AS k,
         |      substr(word, ${i - k + 1}, $k) AS p
         |    FROM d${i - k} WHERE length(word) >= $i""".stripMargin
    }.mkString("\n    UNION ALL ")
    s"""d$i AS MATERIALIZED (SELECT word, freq, best, np, seg FROM (
       |  SELECT c.word, c.freq, c.best + v.sc AS best, c.np + 1 AS np,
       |    CASE WHEN c.seg = '' THEN c.p ELSE c.seg || ' ' || c.p END AS seg,
       |    ROW_NUMBER() OVER (PARTITION BY c.word
       |      ORDER BY c.best + v.sc DESC, c.k DESC) AS rn
       |  FROM ($members) c JOIN v ON v.piece = c.p) WHERE rn = 1)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "text_unigram_viterbi" ->
      s"""WITH w AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
         |                                  x -> x <> '')) AS word
         |        FROM documents) GROUP BY 1),
         |pos AS (SELECT word, freq, s, k
         |  FROM w, (SELECT unnest(range(1, ${OracleMaxLen + 1})) AS s) ss,
         |          (SELECT unnest(range(1, ${MaxPieceLen + 1})) AS k) ks
         |  WHERE s + k - 1 <= length(word)),
         |pc AS (SELECT substr(word, CAST(s AS INTEGER), CAST(k AS INTEGER)) AS piece,
         |    CAST(SUM(freq) AS BIGINT) AS cnt FROM pos GROUP BY 1),
         |v AS MATERIALIZED (SELECT piece,
         |    CAST(length(bin(cnt * cnt)) AS BIGINT) AS sc
         |  FROM pc WHERE length(piece) = 1 OR cnt >= $MinPieceCount),
         |d0 AS (SELECT word, freq, CAST(0 AS BIGINT) AS best,
         |       CAST(0 AS BIGINT) AS np, '' AS seg FROM w),
         |${(1 to OracleMaxLen).map(dpStageSql).mkString(",\n")}
         |SELECT word, freq, np AS n_pieces, best AS total_score, seg
         |FROM (${(1 to OracleMaxLen)
               .map(i => s"SELECT * FROM d$i WHERE length(word) = $i")
               .mkString("\n  UNION ALL ")})
         |ORDER BY word""".stripMargin
  )
}
