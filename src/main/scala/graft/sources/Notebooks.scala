package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Jupyter notebooks (.ipynb) → training text: a code-adjacent crawl
  * is full of them, and the container is just JSON (nbformat 4:
  * `cells[].{cell_type, source[]}`), so the whole tier is Spark
  * built-ins — `from_json` → `transform`/`filter` → `array_join` —
  * with [[graft.functions.MarkdownToText]] cleaning the markdown
  * cells and code cells passing verbatim (the code-model posture:
  * code IS the payload, don't "clean" it). Everything stays inside
  * one projection: no kernel, no shuffle, codegen except the
  * markdown expression itself. Hostile/non-notebook JSON yields
  * nulls via `from_json`'s null contract, never a throw. */
object Notebooks {

  private val CellsSchema =
    "cells ARRAY<STRUCT<cell_type: STRING, source: ARRAY<STRING>>>"

  /** Per-cell extracted text: markdown → cleaned, code → verbatim
    * (right-trimmed), anything else (raw cells) → null. */
  private def cellText(c: Column): Column =
    when(c.getField("cell_type") === "markdown",
      graft.functions.MarkdownToText(concat_ws("", c.getField("source"))))
      .when(c.getField("cell_type") === "code",
        rtrim(concat_ws("", c.getField("source"))))
      .otherwise(lit(null).cast("string"))

  /** (id, n_cells, n_markdown, n_code, text): cell texts joined with
    * one newline, empty/ignored cells contributing nothing. Null for
    * payloads that don't parse as a notebook. */
  def notebookText(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    val parsed = from_json(col(jsonCol), CellsSchema, Map.empty[String, String])
    val cells = parsed.getField("cells")
    df.select(
      col(idCol),
      size(cells).as("n_cells"),
      size(filter(cells, c => c.getField("cell_type") === "markdown"))
        .as("n_markdown"),
      size(filter(cells, c => c.getField("cell_type") === "code"))
        .as("n_code"),
      array_join(
        filter(transform(cells, c => cellText(c)), t => t.isNotNull && t =!= ""),
        "\n").as("text"))
      .withColumn("n_cells", when(col("n_cells") >= 0, col("n_cells")))
      .withColumn("n_markdown", when(col("n_markdown") >= 0, col("n_markdown")))
      .withColumn("n_code", when(col("n_code") >= 0, col("n_code")))
  }
}
