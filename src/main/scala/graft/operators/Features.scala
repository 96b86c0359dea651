package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** ML feature engineering over `documents`: the hashing trick
  * (Weinberger et al., "Feature Hashing for Large Scale Multitask
  * Learning", ICML 2009) and linear-model inference over the hashed
  * features (the fastText-style shallow classifier shape — Joulin et
  * al., "Bag of Tricks for Efficient Text Classification", EACL 2017).
  * Together they are the score-every-document stage of a training-data
  * pipeline: quality/domain classifiers at corpus scale are linear
  * models over hashed n-gram features precisely because inference then
  * needs no vocabulary join — the feature index is a hash, the model is
  * a fixed weight vector, and the whole pass is embarrassingly parallel.
  *
  * Determinism discipline: feature indices and signs come from the
  * engine's portable md5-derived `portable_hash60` (the same hash every
  * dedup/similarity oracle mirrors), weights are small integers, and
  * scores are exact BIGINT sums — both engines agree bit-for-bit with no
  * float accumulation anywhere.
  *
  * Scale shape: one scan of `documents`, explode to tokens, one hash
  * aggregation on compact (doc_id, dim) integer keys, and for inference
  * a second hash aggregation back to doc_id. No joins (the weight
  * vector is arithmetic, not a table), no windows, no driver state. The
  * 100 TB variant is identical — feature hashing was invented for
  * exactly this regime (the model never materializes a vocabulary).
  *
  * Not in the reference (no ML surface); built for the
  * training-pipeline brief alongside dedup/similarity/text-analysis.
  */
object Features {

  /** Feature-space dimensionality. Tiny on purpose: the gate checks the
    * mechanism; real corpora use 2^18-2^22 with the identical plan. */
  val Dims = 16

  /** Signed hashed bag-of-words rows (doc_id, dim, weight): dim =
    * h % Dims, sign = parity of the next hash bits (the collision-bias
    * correction from Weinberger et al. §3 — E[collision contribution]
    * = 0 under a signed hash), weight = Σ signs of the doc's tokens
    * landing in the dim. Only dims a token actually hit are emitted
    * (sparse rows; a weight may still be 0 when signs cancel). */
  private[operators] def featureRows(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
      .filter(col("t") =!= "")
      .select(col("doc_id"),
        expr(s"cast(portable_hash60(t) % $Dims as int)").as("dim"),
        expr(s"case when (portable_hash60(t) div $Dims) % 2 = 0 then 1 else -1 end")
          .cast("long").as("sgn"))
      .groupBy("doc_id", "dim")
      .agg(sum(col("sgn")).as("weight"))
  }

  /** Hashed feature vectors as sparse (doc_id, dim, weight) rows. */
  def featureHashing(spark: SparkSession, dir: String): DataFrame =
    featureRows(spark, dir).orderBy("doc_id", "dim")

  /** Linear classifier inference over the hashed features. The model is
    * a fixed deterministic integer weight vector w(d) = (37·d mod 21) − 10
    * (spread over [−10, 10]) with bias 3 — standing in for trained
    * weights, which would ship the same way (a broadcast array or, as
    * here, pure arithmetic). score = bias + Σ_d w(d)·x_d, exact BIGINT;
    * label = keep iff score > 0. */
  def classifierScore(spark: SparkSession, dir: String): DataFrame =
    featureRows(spark, dir)
      .select(col("doc_id"),
        (col("weight") * ((col("dim") * 37) % 21 - 10).cast("long")).as("c"))
      .groupBy("doc_id")
      .agg((lit(3L) + sum(col("c"))).as("score"))
      .withColumn("label", when(col("score") > 0, "keep").otherwise("drop"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_feature_hashing" -> (featureHashing _),
    "ta_classifier_score" -> (classifierScore _)
  )

  /** Shared oracle CTE: signed hashed token features. */
  private val featCte: String =
    s"""tok AS (SELECT doc_id, u.tk AS t
       |        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tt
       |              FROM documents), UNNEST(tt) AS u(tk)
       |        WHERE u.tk <> ''),
       |hashed AS (SELECT doc_id, ${Dedup.dh60("t")} AS h FROM tok),
       |feat AS (SELECT doc_id, CAST(h % $Dims AS INTEGER) AS dim,
       |           CAST(SUM(CASE WHEN (h // $Dims) % 2 = 0 THEN 1 ELSE -1 END)
       |                AS BIGINT) AS weight
       |         FROM hashed GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "ta_feature_hashing" ->
      s"""WITH $featCte
         |SELECT doc_id, dim, weight FROM feat ORDER BY doc_id, dim""".stripMargin,
    "ta_classifier_score" ->
      s"""WITH $featCte
         |SELECT doc_id,
         |  3 + CAST(SUM(weight * ((dim * 37) % 21 - 10)) AS BIGINT) AS score,
         |  CASE WHEN 3 + SUM(weight * ((dim * 37) % 21 - 10)) > 0
         |       THEN 'keep' ELSE 'drop' END AS label
         |FROM feat GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
