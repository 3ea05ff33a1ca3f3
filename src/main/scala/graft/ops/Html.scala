package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the standard pre-C4 web-pipeline
  * stage (jusText / trafilatura / boilerpipe family): segment a page
  * into blocks at block-level tag boundaries, score each block by text
  * length and link density, keep the content-like blocks and drop
  * navigation/boilerplate, then feed the recovered text to the existing
  * C4/Gopher/quality filters.
  *
  * This is the published jusText heuristic reduced to its two dominant
  * signals (block text length and anchor-character density — the
  * context-free "short"/"bad"/"good" classification); the stoplist
  * refinement jusText layers on top is language-specific and belongs
  * behind [[TextOps.langGuess]] upstream.
  *
  * Scale design (100 TB): every operator here is a pure per-row chain
  * of codegen'd `split`/`regexp_*` and higher-order array functions
  * (`transform`/`filter`/`aggregate`) — no UDF, no explode, NO SHUFFLE:
  * one map stage fused into the scan, the per-document block list never
  * leaves the row. The integer density test (`anchor_chars * 100 <=
  * text_len * maxLinkPct`) avoids float division, so verdicts are exact
  * and replayable in any engine.
  */
object Html {

  /** Block-level tag boundary (opening, closing, or self-closing) — the
    * segmentation points. Inline tags (`<a>`, `<b>`, `<span>`, ...) do
    * NOT split blocks; they are stripped within each block. */
  val BlockTagPattern: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|nav|header|footer|" +
      "aside|section|article|blockquote|pre|br)(?:\\s[^>]*)?/?>"

  /** Anchor element with its text as capture group 1 — the link-density
    * signal. Dot-all + case-insensitive so multiline anchors count. */
  val AnchorPattern: String = "(?is)<a[^>]*>(.*?)</a>"

  /** Any remaining tag (inline elements, comments' brackets) — stripped
    * to a space before whitespace collapse so `a<b>b` reads "a b". */
  val TagPattern: String = "<[^>]*>"

  /** Visible text of one block chunk: tags to spaces, whitespace
    * collapsed, trimmed. */
  private def blockText(b: Column): Column =
    trim(regexp_replace(regexp_replace(b, TagPattern, " "), "\\s+", " "))

  /** Characters of anchor text inside one block chunk, under the SAME
    * normalization as [[blockText]] (inner tags to spaces, whitespace
    * collapsed, trimmed): the link-density test compares anchor mass to
    * block mass, so the two signals must count characters identically —
    * a pretty-printed multi-line anchor would otherwise inflate
    * `anchor_chars` past the collapsed block length and over-drop
    * genuine content blocks. */
  private def anchorChars(b: Column): Column =
    aggregate(regexp_extract_all(b, lit(AnchorPattern), lit(1)), lit(0),
      (acc, a) => acc + length(trim(regexp_replace(
        regexp_replace(a, TagPattern, " "), "\\s+", " "))))

  /** Array of (text, anchor_chars) structs for every NON-EMPTY block of
    * `html` — the segmentation + per-block signals, one expression. */
  def blocks(html: Column): Column =
    filter(
      transform(split(html, BlockTagPattern),
        b => struct(blockText(b).as("text"), anchorChars(b).as("anchor_chars"))),
      s => s.getField("text") =!= "")

  /** The jusText-style keep test: long enough AND link-sparse enough.
    * Integer arithmetic only (exact, engine-independent). */
  private def isContent(s: Column, minTextLen: Int, maxLinkPct: Int): Column =
    length(s.getField("text")) >= minTextLen &&
      s.getField("anchor_chars") * 100 <= length(s.getField("text")) * maxLinkPct

  /** Main-content extraction over an HTML column. Adds:
    *  - `n_blocks`:  non-empty blocks on the page;
    *  - `n_kept`:    blocks classified as content;
    *  - `content`:   kept block texts joined with single spaces — the
    *                 recovered main text, ready for C4/Gopher filters;
    *  - `content_len` / `boiler_len`: character mass kept vs dropped.
    *
    * Thresholds: `minTextLen` drops the jusText "short" class (stray
    * labels, dates, button captions); `maxLinkPct` drops the "bad"
    * link-dense class (navigation, tag clouds, footers) — a block is
    * boilerplate when anchors make up more than `maxLinkPct`% of its
    * visible characters. One map stage, no shuffle, at any scale. */
  def extract(df: DataFrame, htmlCol: String, minTextLen: Int = 10,
      maxLinkPct: Int = 30): DataFrame = {
    Sampling.requireFreshColumns(df, "Html.extract",
      "n_blocks", "n_kept", "content", "content_len", "boiler_len", "__blocks")
    val kept = filter(col("__blocks"), s => isContent(s, minTextLen, maxLinkPct))
    val dropped = filter(col("__blocks"), s => !isContent(s, minTextLen, maxLinkPct))
    df.withColumn("__blocks", blocks(col(htmlCol)))
      .withColumn("n_blocks", size(col("__blocks")))
      .withColumn("n_kept", size(kept))
      .withColumn("content",
        array_join(transform(kept, s => s.getField("text")), " "))
      .withColumn("content_len", length(col("content")))
      .withColumn("boiler_len",
        aggregate(dropped, lit(0), (acc, s) => acc + length(s.getField("text"))))
      .drop("__blocks")
  }
}
