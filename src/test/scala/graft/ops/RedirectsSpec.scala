package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Redirects.resolve]] (chain shapes, cycles, bounds,
  * determinism) and [[graft.sources.Warc.resolveLocation]] (the
  * RFC 9110 relative-Location forms). */
class RedirectsSpec extends SparkSpec {
  import spark.implicits._

  private def resolveAll(edges: Seq[(String, String)], maxHops: Int = 8) =
    Redirects.resolve(edges.toDF("s", "t"), "s", "t", maxHops)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("cutLineage = true is row-identical to the lazy form") {
    // chains, a cycle, a fork collapse, across power-of-2 and
    // non-power-of-2 bounds — the eager lineage cut must be purely
    // physical (r20: it exists so the jump levels stop recomputing
    // under each broadcast build)
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "d",
      "x" -> "d", "p" -> "q",
      "c1" -> "c2", "c2" -> "c1",
      "f" -> "z", "f" -> "a") ++
      (0 until 12).map(i => s"u$i" -> s"u${i + 1}")
    for (hops <- Seq(1, 2, 3, 6, 8)) {
      val lazyRows = Redirects.resolve(edges.toDF("s", "t"), "s", "t", hops)
        .as[(String, String, Long, Boolean)].collect().toSet
      val cutRows = Redirects.resolve(edges.toDF("s", "t"), "s", "t", hops,
          cutLineage = true)
        .as[(String, String, Long, Boolean)].collect().toSet
      assert(cutRows == lazyRows, s"cutLineage drift at maxHops=$hops")
    }
  }

  test("chains resolve to their landing URL with hop counts") {
    val r = resolveAll(Seq(
      "a" -> "b", "b" -> "c", "c" -> "d", // 3-hop chain
      "x" -> "d",                         // 1-hop
      "p" -> "q"))                        // separate chain
    assert(r("a") == (("d", 3L, true)))
    assert(r("b") == (("d", 2L, true)))
    assert(r("c") == (("d", 1L, true)))
    assert(r("x") == (("d", 1L, true)))
    assert(r("p") == (("q", 1L, true)))
    assert(!r.contains("d")) // landing URLs are not sources
  }

  test("cycles and over-long chains are cut at the bound, terminal=false") {
    val cyc = resolveAll(Seq("a" -> "b", "b" -> "a"), maxHops = 5)
    // hop parity: 5 hops from a through the 2-cycle lands on b — and
    // the cut is FLAGGED, never silently keyed on
    assert(cyc("a") == (("b", 5L, false)))
    assert(cyc("b") == (("a", 5L, false)))
    val long = resolveAll(
      (0 until 12).map(i => s"u$i" -> s"u${i + 1}"), maxHops = 8)
    assert(long("u0") == (("u8", 8L, false))) // cut, flagged
    assert(long("u5") == (("u12", 7L, true))) // fits within the bound
  }

  test("pointer doubling is exact at non-power-of-2 hop bounds") {
    // r19: resolve is pointer-doubled (descending greedy binary
    // decomposition) — the cap must stay EXACT, not round to a power
    // of two. Chain of 10 at maxHops=6: cut at exactly 6, flagged.
    val chain10 = (0 until 10).map(i => s"u$i" -> s"u${i + 1}")
    val cut = resolveAll(chain10, maxHops = 6)
    assert(cut("u0") == (("u6", 6L, false)))
    // dist < bound lands on the sink with its true hop count…
    val chain5 = (0 until 5).map(i => s"v$i" -> s"v${i + 1}")
    assert(resolveAll(chain5, maxHops = 6)("v0") == (("v5", 5L, true)))
    // …and dist == bound exactly reaches the sink (the last greedy
    // level shrinks at the tail instead of overshooting)
    val chain6 = (0 until 6).map(i => s"w$i" -> s"w${i + 1}")
    assert(resolveAll(chain6, maxHops = 6)("w0") == (("w6", 6L, true)))
    // maxHops=1: only the first edge, never more
    assert(resolveAll(chain10, maxHops = 1)("u0") == (("u1", 1L, false)))
  }

  test("self-redirects drop; duplicate captures resolve deterministically") {
    val r = resolveAll(Seq("a" -> "a", "b" -> "c"))
    assert(!r.contains("a") && r("b") == (("c", 1L, true)))
    // two captures of one source: lexicographically-least target wins
    val d = resolveAll(Seq("s" -> "z", "s" -> "m"))
    assert(d("s") == (("m", 1L, true)))
  }

  test("resolveLocation: absolute, protocol-relative, root-relative, path-relative") {
    import graft.sources.Warc.resolveLocation
    val base = "http://ex.com/dir/page?x=1"
    assert(resolveLocation(base, "https://other.site/p") ==
      "https://other.site/p")
    assert(resolveLocation(base, "//cdn.site/a") == "http://cdn.site/a")
    assert(resolveLocation(base, "/root/x") == "http://ex.com/root/x")
    assert(resolveLocation(base, "sibling") == "http://ex.com/dir/sibling")
    // canonicalization applies: case/port/dot-segment fold
    assert(resolveLocation(base, "HTTP://Ex.COM:80/./a") == "http://ex.com/a")
    // hostile: null/empty/baseless never throw
    assert(resolveLocation(base, null) == null)
    assert(resolveLocation(base, "   ") == null)
    assert(resolveLocation("no-scheme", "/x") == null)
    // non-hierarchical schemes are NOT page identities and must not
    // resolve as path-relative (ADVICE r18: http://ex.com/dir/mailto:x
    // edges fabricated from mailto Location values)
    assert(resolveLocation(base, "mailto:x@y.example") == null)
    assert(resolveLocation(base, "tel:+15551234567") == null)
    assert(resolveLocation(base, "javascript:void(0)") == null)
    assert(resolveLocation(base, "ftp://files.example/a") == null)
    // a colon AFTER the first path segment is not a scheme
    assert(resolveLocation(base, "a/b:c") == "http://ex.com/dir/a/b:c")
  }
}
