package graft.operators

import graft.SparkSpec

/** Driver-side recompute of the HTML boilerplate extraction: rebuild each
  * document's synthesized page with plain JVM string code, run the same
  * generic block/link-density rules with java.util.regex, and require the
  * distributed result to match field-for-field (including the extracted
  * content string). This is the independent third formulation next to the
  * Spark expressions and the DuckDB oracle. */
class HtmlSpec extends SparkSpec {

  private def synth(docId: Long, text: String, lang: String, source: String,
      nChars: Long): String = {
    val half = (nChars / 2).toInt
    val farm =
      if (docId % 5 == 0)
        s"""<div><a href="/l">$lang archive</a> <a href="/s">more $source</a></div>"""
      else ""
    s"""<html><head><title>doc $docId</title><style>p{margin:0}</style>""" +
      s"""<script>var page=$docId;</script></head><body>""" +
      s"""<div><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>""" +
      s"<p>${text.substring(0, half)}</p>" + farm +
      s"<p>${text.substring(half)}</p>" +
      s"""<div><a href="/terms">Terms</a> <a href="/privacy">Privacy</a></div>""" +
      "</body></html>"
  }

  test("html extraction: distributed result equals JVM-regex recompute") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val expected = docs.map { case (id, text, lang, source, n) =>
      val page = synth(id, text, lang, source, n)
      val clean = page
        .replaceAll("<script[^>]*>[^<]*</script>", " ")
        .replaceAll("<style[^>]*>[^<]*</style>", " ")
      val blocks = clean.split("</?(p|div|li|ul|ol|br|h[1-6])([^>]*)?>", -1)
      val rows = blocks.map { blk =>
        val txt = blk.replaceAll("<[^>]*>", "").trim
        val linkChars = blk.replaceAll("<[^>]*>", "").length -
          blk.replaceAll("<a( [^>]*)?>[^<]*</a>", "")
            .replaceAll("<[^>]*>", "").length
        (txt, linkChars)
      }.filter(_._1.nonEmpty)
      val dropped = rows.count { case (t, lc) => lc * 2 > t.length }
      val content = rows.collect {
        case (t, lc) if lc * 2 <= t.length => t
      }.mkString(" ")
      id -> (rows.length.toLong, dropped.toLong, content.length.toLong, content)
    }.toMap
    val got = Html.htmlExtract(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getString(5)))
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (id, nb, nd, ratio, cc, content) =>
      val (enb, end, ecc, econtent) = expected(id)
      assert(nb == enb, s"doc $id n_blocks")
      assert(nd == end, s"doc $id n_dropped")
      assert(cc == ecc, s"doc $id content_chars")
      assert(content == econtent, s"doc $id content")
      assert(ratio == end.toDouble / enb.toDouble, s"doc $id ratio")
    }
    // the rules actually fire: every page drops its nav/footer/link blocks
    assert(got.forall(_._3 >= 2), "nav and footer dropped everywhere")
  }
}
