package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the training-prep step between
  * cleaning and packing: split each document into overlapping windows
  * of at most `maxTokens` whitespace tokens, so downstream tokenize/
  * pack stages see bounded-length inputs. [[Packing.packSequences]]
  * then bins the chunks; [[Repetition]]/[[Dedup]] run before, on the
  * whole document.
  *
  * MAP-ONLY: chunk boundaries depend only on the row, so this is one
  * projection + explode — no shuffle, and a huge document costs only
  * its own task time. Chunk starts step by `maxTokens - overlap`;
  * the last window is short rather than padded; a document with at
  * most `maxTokens` tokens yields exactly one chunk; an empty
  * document yields none (there is nothing to train on — unlike the
  * quality signals, which must SEE empty docs to filter them).
  */
object Chunking {

  /** Explode `df(textCol)` into `idCol, chunk_id, n_tok, chunk`
    * rows. `chunk_id` is 0-based and consecutive; `chunk` re-joins
    * the window's tokens with single spaces (the tokenizer's
    * whitespace normalization — byte-exact reconstruction is not a
    * goal, bounded token windows are). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap vs $maxTokens")
    val step = maxTokens - overlap
    val w = col("__words")
    val n = size(w).cast("long")
    // ceil((n - overlap) / step), at least 1 for non-empty docs: the
    // count of window starts 0, step, 2*step … that add new tokens
    val nChunks = when(n === 0L, 0L).otherwise(
      greatest(floor((n - overlap + (step - 1)) / lit(step)).cast("long"), lit(1L)))
    val chunks = transform(sequence(lit(0L), nChunks - 1L),
      i => struct(i.as("chunk_id"),
        concat_ws(" ", slice(w, (i * step + 1L).cast("int"), lit(maxTokens)))
          .as("chunk")))
    // tokenize+slice is the cost — spread a few-split scan first
    graft.core.Engine.widen(df).select(col(idCol),
        filter(split(col(textCol), "\\s+"), (x: Column) => x =!= "").as("__words"))
      .where(size(w) > 0)
      .select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_id").as("chunk_id"),
        (size(split(col("__c.chunk"), " ")).cast("long")).as("n_tok"),
        col("__c.chunk").as("chunk"))
  }
}
