package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the df-cap head/tail split of [[TextAnalysis.sparseCosineTopk]]
  * (r13 verdict item 3):
  *
  *  1. EXACTNESS — top-5 (values included) identical to the unsplit
  *     single-postings-join formulation on the real corpus, so the cap
  *     is a plan-structure bound, not a ranking approximation;
  *  2. the tail arm's join keys are genuinely df-bounded and the head
  *     arm genuinely non-empty on this corpus (30 of 31 terms sit above
  *     the nd/10 cap — the split is exercised, not vacuous);
  *  3. the head arm's probe side carries an explicit broadcast hint, so
  *     the hot-token postings can never shuffle on the token key at any
  *     scale.
  */
class SparseCosineCapSpec extends SparkSpec {

  test("split result equals the unsplit formulation, top-5 and values") {
    val got = TextAnalysis.sparseCosineTopk(spark, sfDir)
      .select("doc_a", "rnk", "doc_b", "dot", "sim").collect().toSeq
    // unsplit reference: the r13 single-join formulation, rebuilt inline
    val tok = graft.core.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
    val n = graft.core.Tables.documents(spark, sfDir).agg(count(lit(1)).as("nd"))
    val w = tf.join(dfreq, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), (col("tf") * expr("nd div df")).as("w"))
    val norms = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    val probes = w.filter(col("doc_id") < 200)
      .select(col("doc_id").as("doc_a"), col("token"), col("w").as("wa"))
    val ref = probes
      .join(w.select(col("doc_id").as("doc_b"), col("token"), col("w").as("wb")),
        "token")
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("n2a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("n2b")), "doc_b")
      .withColumn("sim", col("dot").cast("double") /
        sqrt(col("n2a").cast("double") * col("n2b").cast("double")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_a"))
          .orderBy(col("sim").desc, col("doc_b"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("doc_a"), col("rnk"), col("doc_b"), col("dot"), col("sim"))
      .orderBy("doc_a", "rnk").collect().toSeq
    assert(got == ref, "df-cap split changed the top-5 or its values")
  }

  test("the split is exercised: head nonempty, tail df-bounded, cap gated") {
    val out = TextAnalysis.sparseCosineTopk(spark, sfDir)
    val cap = out.select("df_cap").head().getLong(0)
    val tok = graft.core.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(col("token") =!= "")
    val dfs = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
      .collect().map(_.getLong(1))
    val nd = graft.core.Tables.documents(spark, sfDir).count()
    assert(cap == nd / TextAnalysis.SparseDfCapDenom)
    assert(dfs.count(_ > cap) > 0, "no head terms — the split is vacuous here")
    assert(dfs.count(_ <= cap) > 0, "no tail terms — the split is vacuous here")
  }

  test("head arm probe side is hint-broadcast ON THE HEAD JOIN ITSELF " +
    "(the scalar-nd crossJoin and norm joins must not satisfy this — " +
    "r14 advice: the whole-plan string check was vacuously passable)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, BROADCAST}
    val lp = TextAnalysis.sparseCosineTopk(spark, sfDir)
      .queryExecution.optimizedPlan
    // the head join is the ONLY join with the dense probe-vector columns
    // (p0, p1, ...) on one side; its probe side must carry the broadcast
    // strategy hint so hot-token vectors can never shuffle at any scale
    val headJoins = lp.collect {
      case j: Join if j.right.output.exists(_.name == "p0") ||
        j.left.output.exists(_.name == "p0") => j
    }
    assert(headJoins.nonEmpty,
      s"no join with dense probe-vector columns found:\n$lp")
    assert(headJoins.exists { j =>
      (j.right.output.exists(_.name == "p0") &&
        j.hint.rightHint.exists(_.strategy.contains(BROADCAST))) ||
      (j.left.output.exists(_.name == "p0") &&
        j.hint.leftHint.exists(_.strategy.contains(BROADCAST)))
    }, s"head join's probe-vector side lost its broadcast hint:\n$headJoins")
  }

  test("pivot-limit overflow routes to the tail arm, output limit-invariant " +
    "(r15 advice: a >limit head inventory must degrade, not abort)") {
    // the corpus has ~30 head terms; limit 4 forces most of the head
    // back through the postings arm — top-5 and every value must match
    // the default-limit output exactly (the split is exact either way)
    val tiny = TextAnalysis.sparseCosineTopkAt(spark, sfDir, headLimit = 4)
      .select("doc_a", "rnk", "doc_b", "dot", "sim").collect().toSeq
    val full = TextAnalysis.sparseCosineTopk(spark, sfDir)
      .select("doc_a", "rnk", "doc_b", "dot", "sim").collect().toSeq
    assert(tiny == full, "overflow routing changed the top-5 or its values")
    // limit 0 = pure postings plan, the degenerate bound
    val none = TextAnalysis.sparseCosineTopkAt(spark, sfDir, headLimit = 0)
      .select("doc_a", "rnk", "doc_b", "dot", "sim").collect().toSeq
    assert(none == full, "all-overflow (pure postings) diverged")
  }
}
