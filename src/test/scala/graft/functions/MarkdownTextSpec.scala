package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[MarkdownToText]]: every declared transform, hostile input,
  * and the Column surface. */
class MarkdownTextSpec extends SparkSpec {
  import spark.implicits._

  private def c(md: String) = MarkdownToText.clean(md)

  test("headings, lists, quotes, rules, setext underlines") {
    val md =
      """# Title
        |## Sub title
        |####### not a heading
        |#missing-space stays
        |
        |- item a
        |* item b
        |+ item c
        |12. numbered
        |> quoted
        |>> nested quote
        |---
        |***
        |Setext heading
        |===
        |""".stripMargin
    assert(c(md) ==
      "Title\nSub title\n####### not a heading\n#missing-space stays\n" +
        "item a\nitem b\nitem c\nnumbered\nquoted\nnested quote\n" +
        "Setext heading")
  }

  test("links, images, inline code, emphasis; underscores preserved") {
    assert(c("see [the docs](http://x/y) and ![alt text](img.png).") ==
      "see the docs and alt text.")
    assert(c("use `my_func` and **bold** or *italic* in snake_case") ==
      "use my_func and bold or italic in snake_case")
    // unbalanced brackets stay literal (hostile markup never eats text)
    assert(c("a [dangling bracket and (paren") == "a [dangling bracket and (paren")
    // nested image-with-link: the image span resolves to the first
    // ']'-'(' pair, then the link pass resolves the inner span —
    // both URLs drop, all alt/text survives
    assert(c("![a [b](u) c](v)") == "a b c")
  }

  test("fenced code blocks drop entirely, both fence styles") {
    val md = "before\n```scala\nval x = 1\n```\nafter\n~~~\nraw\n~~~\nend"
    assert(c(md) == "before\nafter\nend")
    // an unclosed fence drops to the end, never throws
    assert(c("keep\n```\nlost forever") == "keep")
  }

  test("total on hostile input") {
    assert(c(null) == null)
    assert(c("") == "")
    assert(c("\n\n\n") == "")
    val rnd = new scala.util.Random(90)
    (0 until 50).foreach { _ =>
      val junk = new String(Array.fill(200)(rnd.nextPrintableChar()))
      MarkdownToText.clean(junk) // must not throw
    }
  }

  test("markdown_to_text as a Column over a frame") {
    val got = Seq((1L, "# H\n- li [x](u)")).toDF("id", "md")
      .select(col("id"), MarkdownToText(col("md")).as("t"))
      .as[(Long, String)].head()
    assert(got == ((1L, "H\nli x")))
  }

  test("notebookText: markdown + code cells, raw cells drop, junk is null") {
    val nb =
      """{"cells":[
        |{"cell_type":"markdown","source":["# Note\n","hello **world**\n"]},
        |{"cell_type":"code","source":["x = 1\n","print(x)"]},
        |{"cell_type":"raw","source":["ignored"]}
        |]}""".stripMargin
    val rows = graft.sources.Notebooks.notebookText(
        Seq((1L, nb), (2L, "not a notebook")).toDF("id", "js"), "id", "js")
      .orderBy("id").collect()
    assert(rows(0).getAs[Int]("n_cells") == 3)
    assert(rows(0).getAs[Int]("n_markdown") == 1)
    assert(rows(0).getAs[Int]("n_code") == 1)
    assert(rows(0).getAs[String]("text") == "Note\nhello world\nx = 1\nprint(x)")
    assert(rows(1).isNullAt(rows(1).fieldIndex("text")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("n_cells")))
  }
}
