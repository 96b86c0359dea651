package graft.operators

import graft.SparkSpec

/** The residual-quantized IVFADC must DOMINATE the raw-vector codes at
  * equal code size — that is the entire point of Jégou et al.'s residual
  * composition, and the oracle alone only proves both variants were
  * computed correctly, not that the refinement helps. Coding residuals
  * removes the cell-level variance the coarse quantizer already
  * explains, so reconstruction error must drop strictly; ranking recall
  * must not regress (it typically improves — at sf0.01 it doubles). */
class IvfAdcResidualSpec extends SparkSpec {

  test("residual codes dominate raw codes at equal code size") {
    val rows = Similarity.ivfadcResidual(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == Set("adc_raw", "adc_residual"))
    val (rawHits, rawN, rawRecall, rawErr) = rows("adc_raw")
    val (resHits, resN, resRecall, resErr) = rows("adc_residual")
    assert(rawN == resN && rawN > 0, "identical candidate sets and gt")
    assert(resErr < rawErr,
      s"residual reconstruction error must drop strictly ($resErr vs $rawErr)")
    assert(resRecall >= rawRecall,
      s"residual recall must not regress ($resRecall vs $rawRecall)")
    assert(resHits >= rawHits)
  }
}
