package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML main-content extraction contracts ([[Html]]):
  *  - block segmentation at block-level tags only (inline tags strip);
  *  - link-density and min-length classification (the jusText classes);
  *  - CHARACTER-EXACT recovery of the planted main text on the q128
  *    page skeleton over real corpus documents;
  *  - plan shape: one map stage, no shuffle, no explode.
  */
class HtmlSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("block segmentation + stripping: known page decomposes exactly") {
    val page = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">Docs</a></nav>" +
      "<h1>A Title Here</h1>" +
      "<p>First paragraph with plenty of visible text in it.</p>" +
      "<p>Short</p>" + // < minTextLen → jusText "short" class
      "<div>Second <b>paragraph</b> keeps <i>inline</i> markup text.</div>" +
      "<ul><li><a href=\"/t\">tag</a></li></ul>" +
      "<footer>(c) footer <a href=\"/tos\">Terms of Service page</a></footer>" +
      "</body></html>"
    val out = Html.extract(Seq((1L, page)).toDF("id", "html"), "html")
      .select("n_blocks", "n_kept", "content", "content_len", "boiler_len")
      .head()
    // non-empty blocks: nav, h1, p1, p2(short), div, li, footer = 7
    assert(out.getAs[Int]("n_blocks") == 7, s"n_blocks: $out")
    // kept: h1 (12 chars, no links), p1, div — nav/li are link-dense,
    // "Short" is short, footer is 60% anchor chars
    assert(out.getAs[Int]("n_kept") == 3, s"n_kept: $out")
    assert(out.getAs[String]("content") ==
      "A Title Here First paragraph with plenty of visible text in it. " +
        "Second paragraph keeps inline markup text.")
    // boiler mass: "Home Docs"(9) + "Short"(5) + "tag"(3) + "(c) footer
    // Terms of Service page"(32) = 49
    assert(out.getAs[Int]("boiler_len") == 49, s"boiler_len: $out")
  }

  test("anchor text counts under blockText's normalization: multi-line anchors don't inflate density") {
    // Pretty-printed anchor: 8 visible chars ("tag here") but 11 raw
    // chars (newline + indent). Block text collapses to 32 chars.
    // Normalized anchor = 8 -> 800 <= 32*30=960 KEEP; the raw count
    // (11 -> 1100 > 960) would have wrongly dropped the block.
    val page = "<p>aaaaa bbbbb ccccc ddddd <a href=\"#\">tag\n   here</a></p>"
    val out = Html.extract(Seq((1L, page)).toDF("id", "html"), "html")
      .select("n_kept", "content").head()
    assert(out.getAs[Int]("n_kept") == 1, s"multi-line anchor over-dropped: $out")
    assert(out.getAs[String]("content") == "aaaaa bbbbb ccccc ddddd tag here")
    // anchor_chars can never exceed the normalized block length now:
    // an all-anchor pretty-printed block sits exactly AT 100% density
    val allAnchor = "<p><a href=\"#\">only\n  anchor\n  text</a></p>"
    val blocks = Seq((1L, allAnchor)).toDF("id", "html")
      .select(Html.blocks(col("html")).as("b"))
      .select(explode(col("b")).as("s"))
      .select(col("s.text"), col("s.anchor_chars"))
      .as[(String, Int)].collect()
    assert(blocks.length == 1)
    assert(blocks(0)._1.length == blocks(0)._2,
      s"anchor chars ${blocks(0)._2} != normalized text ${blocks(0)._1.length}")
  }

  test("link-density boundary: exactly at maxLinkPct keeps, just over drops") {
    // text "aaaaa bbbbb ccccc dddd" = 22 chars; anchor "aaaaa" = 5 chars
    // → 500 <= 22*30 = 660 keep; anchor "aaaaa bbbbb" = 11 → 1100 > 660 drop
    val keepPage = "<p><a href=\"#\">aaaaa</a> bbbbb ccccc dddd</p>"
    val dropPage = "<p><a href=\"#\">aaaaa bbbbb</a> ccccc dddd</p>"
    val out = Html.extract(
      Seq((1L, keepPage), (2L, dropPage)).toDF("id", "html"), "html")
      .orderBy("id").select("n_kept").as[Int].collect()
    assert(out.sameElements(Array(1, 0)), out.mkString(","))
  }

  test("q128 page skeleton: content recovers the document text EXACTLY") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(100)
    val p2 = concat(lit("Article body continues with further detail for doc "),
      col("doc_id").cast("string"), lit("."))
    val html = concat(
      lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact</a></nav><p>"),
      col("text"),
      lit("</p><p>"), p2, lit("</p>" +
        "<ul><li><a href=\"/t1\">tag one</a></li>" +
        "<li><a href=\"/t2\">tag two</a></li></ul>" +
        "<footer>(c) 2026 <a href=\"/tos\">Terms</a> " +
        "<a href=\"/privacy\">Privacy</a></footer></body></html>"))
    val expected = concat(trim(regexp_replace(col("text"), "\\s+", " ")),
      lit(" "), p2)
    val got = Html.extract(docs.withColumn("html", html), "html")
    val bad = got.filter(col("content") =!= expected)
    assert(bad.count() == 0, {
      val ex = bad.select("content").take(1).toSeq
      s"extraction did not recover main text: $ex"
    })
    // every page: 6 non-empty blocks, 2 kept, boilerplate mass 54
    assert(got.filter(col("n_blocks") =!= 6 || col("n_kept") =!= 2 ||
      col("boiler_len") =!= 54).count() == 0)
  }

  test("plan shape: one map stage — no Exchange, no Generate/explode") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("html"))
    val p = Html.extract(docs, "html").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Generate"), p)
  }
}
