package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** HTML boilerplate extraction — the first text operator of every real
  * pretraining pipeline (strip markup, drop navigation/footer/link-list
  * blocks, keep the content) run BEFORE any quality gate. The block
  * link-density rule is the core of the classic extractors (Kohlschütter
  * et al., "Boilerplate detection using shallow text features", WSDM 2010
  * — boilerpipe's densitometric family): split the page at block-level
  * tags, strip inline markup per block, and drop blocks whose anchor-text
  * share exceeds half their text.
  *
  * The documents table is plain text, so the operator follows the media
  * synthesizer pattern (Multimodal.scala: synthesize a deterministic
  * payload, then run the REAL decoder on it): each document is wrapped in
  * a deterministic HTML page — head with title/style/script, a nav link
  * bar, the text split across two content paragraphs, a link-farm div on
  * every fifth document, and a link footer — and the extractor then runs
  * GENERIC markup rules with no knowledge of the synthesis. The DuckDB
  * oracle rebuilds the same page and applies the same rules (RE2 and Java
  * regex agree on every pattern used: no backrefs, no lookaround), so
  * block counts, drop decisions, and the extracted text are all
  * hash-gated at both scales.
  *
  * Scale shape: one scan, all per-row string work (synthesis, tag strip,
  * density) inside codegen'd string expressions; the only shuffle is the
  * per-document regroup of block rows, keyed on doc_id — at 100 TB the
  * synthesis column disappears (real pages arrive as a column) and the
  * extractor is the same one-scan + one-keyed-agg plan. Link density is
  * compared by integer cross-multiply (2·link_chars > text_chars), never
  * a float division, so the decision is exact in both engines.
  */
object Html {

  /** Deterministic page synthesis (Spark SQL dialect). */
  private val synthSpark: String =
    """concat(
      |  '<html><head><title>doc ', cast(doc_id as string),
      |  '</title><style>p{margin:0}</style>',
      |  '<script>var page=', cast(doc_id as string), ';</script></head><body>',
      |  '<div><a href="/">Home</a> <a href="/about">About</a>',
      |  ' <a href="/contact">Contact</a></div>',
      |  '<p>', substring(text, 1, n_chars div 2), '</p>',
      |  case when doc_id % 5 = 0 then concat(
      |    '<div><a href="/l">', lang, ' archive</a>',
      |    ' <a href="/s">more ', source, '</a></div>') else '' end,
      |  '<p>', substring(text, n_chars div 2 + 1, n_chars), '</p>',
      |  '<div><a href="/terms">Terms</a> <a href="/privacy">Privacy</a></div>',
      |  '</body></html>')""".stripMargin

  /** The same page in DuckDB SQL. */
  private val synthDuck: String =
    """'<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
      |  || '</title><style>p{margin:0}</style>'
      |  || '<script>var page=' || CAST(doc_id AS VARCHAR) || ';</script></head><body>'
      |  || '<div><a href="/">Home</a> <a href="/about">About</a>'
      |  || ' <a href="/contact">Contact</a></div>'
      |  || '<p>' || substr(text, 1, n_chars // 2) || '</p>'
      |  || CASE WHEN doc_id % 5 = 0 THEN
      |       '<div><a href="/l">' || lang || ' archive</a>'
      |       || ' <a href="/s">more ' || source || '</a></div>' ELSE '' END
      |  || '<p>' || substr(text, n_chars // 2 + 1, n_chars) || '</p>'
      |  || '<div><a href="/terms">Terms</a> <a href="/privacy">Privacy</a></div>'
      |  || '</body></html>'""".stripMargin
      // flattened before interpolation into the oracle s-string: its own
      // stripMargin would otherwise eat the leading `|` of a line-initial
      // `||` concat operator
      .replace("\n", " ")

  /** Block splitter: any block-level open/close tag ends a block. */
  private val BlockRe = "</?(p|div|li|ul|ol|br|h[1-6])([^>]*)?>"

  /** Anchor elements (tag + text), for the link-character count. */
  private val AnchorRe = "<a( [^>]*)?>[^<]*</a>"

  /** doc_id → synthesized page, split to indexed blocks with per-block
    * text and anchor-text character counts (all codegen'd string ops). */
  private def blocks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("html", expr(synthSpark))
      // script/style elements vanish wholesale before block analysis
      .withColumn("clean", expr(
        """regexp_replace(regexp_replace(html,
          |  '<script[^>]*>[^<]*</script>', ' '),
          |  '<style[^>]*>[^<]*</style>', ' ')""".stripMargin))
      .select(col("doc_id"),
        posexplode(split(col("clean"), BlockRe)).as(Seq("i", "blk")))
      .withColumn("txt", trim(regexp_replace(col("blk"), "<[^>]*>", "")))
      .withColumn("text_chars", length(col("txt")))
      .withColumn("link_chars",
        length(regexp_replace(col("blk"), "<[^>]*>", "")) -
          length(regexp_replace(
            regexp_replace(col("blk"), AnchorRe, ""), "<[^>]*>", "")))

  /** Per-document extraction report: block counts, the boilerplate drop
    * count, and the extracted content (kept blocks in page order). */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    blocks(spark, dir)
      .filter(col("text_chars") > 0)
      .withColumn("dropped",
        (col("link_chars") * 2 > col("text_chars")).cast("long"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("dropped")).as("n_dropped"),
        expr("""array_join(transform(
               |  array_sort(filter(collect_list(struct(i, txt, dropped)),
               |                    b -> b.dropped = 0)),
               |  b -> b.txt), ' ')""".stripMargin).as("content"))
      .withColumn("content_chars", length(col("content")).cast("long"))
      .withColumn("boilerplate_ratio",
        col("n_dropped").cast("double") / col("n_blocks").cast("double"))
      .select("doc_id", "n_blocks", "n_dropped", "boilerplate_ratio",
        "content_chars", "content")
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_html_extract" -> (htmlExtract _)
  )

  val oracle: Map[String, String] = Map(
    "ta_html_extract" ->
      s"""WITH pages AS (
         |  SELECT doc_id, regexp_replace(regexp_replace($synthDuck,
         |      '<script[^>]*>[^<]*</script>', ' ', 'g'),
         |      '<style[^>]*>[^<]*</style>', ' ', 'g') AS clean
         |  FROM documents),
         |blks AS (
         |  SELECT doc_id, string_split_regex(clean, '$BlockRe') AS bl
         |  FROM pages),
         |b AS (
         |  SELECT doc_id, i,
         |    trim(regexp_replace(bl[i + 1], '<[^>]*>', '', 'g')) AS txt,
         |    length(regexp_replace(bl[i + 1], '<[^>]*>', '', 'g'))
         |      - length(regexp_replace(regexp_replace(bl[i + 1],
         |          '$AnchorRe', '', 'g'), '<[^>]*>', '', 'g')) AS link_chars
         |  FROM blks, UNNEST(range(0, len(bl))) AS u(i)),
         |kept AS (
         |  SELECT doc_id, i, txt, length(txt) AS text_chars, link_chars,
         |    CASE WHEN link_chars * 2 > length(txt) THEN 1 ELSE 0 END AS dropped
         |  FROM b WHERE length(txt) > 0)
         |SELECT doc_id,
         |  COUNT(*) AS n_blocks,
         |  CAST(SUM(dropped) AS BIGINT) AS n_dropped,
         |  CAST(SUM(dropped) AS DOUBLE) / COUNT(*) AS boilerplate_ratio,
         |  CAST(length(COALESCE(string_agg(CASE WHEN dropped = 0 THEN txt END,
         |    ' ' ORDER BY i), '')) AS BIGINT) AS content_chars,
         |  COALESCE(string_agg(CASE WHEN dropped = 0 THEN txt END,
         |    ' ' ORDER BY i), '') AS content
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
