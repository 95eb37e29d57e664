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
  * Scale posture: pointer-doubled keyed self-joins of the
  * (src → dst) edge set — ⌊log₂ maxHops⌋ jump-table builds plus one
  * set-bit composition join per extra binary digit of maxHops (3
  * joins + the terminal probe for the default 8, vs 7 for the naive
  * one-edge-per-round walk), shuffle volume O(log hops · |edges|),
  * every join on the chain key. No driver-side iteration state, no collect; a cycle (a→b→a)
  * simply stops advancing at the hop bound and reports
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
  /** `cutLineage = true` (EAGER) localCheckpoints the edge map and
    * every jump level that gets squared again. Without the cut, each
    * level's plan appears BOTH as a streaming input and under the
    * next level's broadcast build, so the builds recompute every
    * lower level (R2 up to 4× at maxHops = 8 — optimization r20,
    * profiled 2× end-to-end on q353's edge set). The cut runs one
    * tiny job per level at CONSTRUCTION (the minHashVerifiedPairs
    * eager precedent) and leaves the checkpoint blocks to the
    * session (a few |edges|-row tables per call) — so batch callers
    * opt in, while unbounded per-micro-batch callers
    * ([[graft.llm.Curation]]'s resolvedStream) keep the lazy
    * default. */
  def resolve(edges0: DataFrame, srcCol: String, dstCol: String,
              maxHops: Int = 8, cutLineage: Boolean = false): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, "maxHops out of range")
    def cut(df: DataFrame): DataFrame =
      if (!cutLineage) df
      else {
        val rdd = df.rdd.localCheckpoint()
        rdd.count() // eager: materialize so consumers share one compute
        df.sparkSession.createDataFrame(rdd, df.schema)
      }
    val edges = cut(edges0
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .where(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d")) // a self-redirect is no move: dropped
      .groupBy("__s").agg(min("__d").as("__d")))
    // Pointer doubling (r18 verdict: the naive one-edge-per-round
    // walk carried maxHops−1 sequential shuffle barriers even when
    // every chain is one hop). Build SATURATING jump tables by
    // repeated squaring — jump_p(u) = (node after min(p,
    // dist-to-sink) edges, that count), jump_2p = jump_p ∘ jump_p
    // with keep-on-miss — in ⌊log₂ maxHops⌋ keyed self-joins of the
    // EDGE set. Saturating composition is EXACT (jump_a ∘ jump_b
    // follows min(a+b, dist) edges: a sink stops matching, a
    // non-sink advances the full remaining span), so composing the
    // levels of maxHops' SET BITS in descending order reaches
    // exactly min(maxHops, dist) hops with NO per-row budget and no
    // no-op join rounds (optimization r19 — the r18 form re-joined
    // EVERY level with a budget test, 6 barrier rounds at maxHops=8
    // where the set-bit composition needs 3 builds and none after).
    // Identical semantics to the one-edge walk — hops ≤ maxHops,
    // deterministic edge collapse, a cycle lands mid-walk with
    // `terminal = false`.
    var levels = List((edges.select(col("__s").as("u"), col("__d").as("v"),
      lit(1).as("len")), 1))
    var span = 1
    while (span * 2 <= maxHops) {
      val j = levels.head._1
      val right = j.select(col("u").as("v"), col("v").as("__v2"),
        col("len").as("__len2"))
      val nxt = j.join(right, Seq("v"), "left")
        .select(col("u"),
          coalesce(col("__v2"), col("v")).as("v"),
          (col("len") + coalesce(col("__len2"), lit(0))).as("len"))
      // only levels that get squared AGAIN are multi-consumer; the
      // widest level is consumed once by the set-bit composition
      levels ::= ((if (span * 4 <= maxHops) cut(nxt) else nxt), span * 2)
      span *= 2
    }
    // head = widest span; compose exactly the set-bit levels
    var cur: DataFrame = null
    var remaining = maxHops
    levels.foreach { case (j, s) =>
      if (s <= remaining) {
        remaining -= s
        cur =
          if (cur == null)
            j.select(col("u").as("src"), col("v").as("cur"),
              col("len").as("hops"))
          else {
            val right = j.select(col("u").as("cur"), col("v").as("__v2"),
              col("len").as("__len2"))
            cur.join(right, Seq("cur"), "left")
              .select(col("src"),
                coalesce(col("__v2"), col("cur")).as("cur"),
                (col("hops") + coalesce(col("__len2"), lit(0))).as("hops"))
          }
      }
    }
    val outgoing = edges.select(col("__s").as("cur"),
      lit(true).as("__has_out"))
    cur.join(outgoing, Seq("cur"), "left")
      .select(col("src"), col("cur").as("final_url"),
        col("hops").cast("long").as("hops"),
        coalesce(!col("__has_out"), lit(true)).as("terminal"))
  }
}
