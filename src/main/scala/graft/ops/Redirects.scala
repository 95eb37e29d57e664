package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — collapse HTTP 3xx chains onto final
  * page identities. A crawl stores `old → new` moves as 3xx captures
  * ([[graft.sources.Warc.warcRedirects]]); dedup and URL quotas that
  * key on the FETCH URL treat every hop of a moved page as a
  * distinct identity, so the same article fetched via its old URL,
  * a shortener and its final home counts three times. Resolving each
  * source to its chain's final target (bounded hops, cycle-safe)
  * gives the identity key those stages should join on.
  *
  * Scale posture: `maxHops` keyed left-joins of the (src → dst) edge
  * set against itself — real chains are short (the web's norm is
  * 1–3 hops; browsers cap near 20), so `maxHops` is a small constant
  * and shuffle volume is O(hops · |edges|) with every join on the
  * chain key. No driver-side iteration state, no collect; a cycle
  * (a→b→a) simply stops advancing at the hop bound and reports
  * `terminal = false`. The reference ships no redirect machinery;
  * this extends SURVEY §2's crawl tier. */
object Redirects {

  /** Resolve every source through the functional redirect graph.
    *
    * Input: one row per redirect edge; `srcCol`/`dstCol` name the
    * columns. Multiple captures of one source (re-crawls) are
    * collapsed DETERMINISTICALLY to the lexicographically-least
    * target (pass pre-deduped edges for a recency rule).
    *
    * Output: (src, final_url, hops, terminal) — `final_url` after
    * following at most `maxHops` edges, `hops` the edges followed,
    * `terminal` true when `final_url` has no outgoing edge (a real
    * landing URL), false when the walk was cut by the bound (cycle
    * or over-long chain — flag those for refetch, don't key on
    * them). */
  def resolve(edges0: DataFrame, srcCol: String, dstCol: String,
              maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, "maxHops out of range")
    val edges = edges0
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .where(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d")) // a self-redirect is no move: dropped
      .groupBy("__s").agg(min("__d").as("__d"))
    var cur = edges.select(col("__s").as("src"), col("__d").as("cur"),
      lit(1).as("hops"))
    var i = 1
    while (i < maxHops) {
      val nxt = edges.select(col("__s").as("cur"), col("__d").as("__next"))
      cur = cur.join(nxt, Seq("cur"), "left")
        .select(col("src"),
          coalesce(col("__next"), col("cur")).as("cur"),
          (col("hops") + when(col("__next").isNotNull, 1).otherwise(0))
            .as("hops"))
      i += 1
    }
    val outgoing = edges.select(col("__s").as("cur"),
      lit(true).as("__has_out"))
    cur.join(outgoing, Seq("cur"), "left")
      .select(col("src"), col("cur").as("final_url"),
        col("hops").cast("long").as("hops"),
        coalesce(!col("__has_out"), lit(true)).as("terminal"))
  }
}
