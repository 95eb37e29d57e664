package graft.sources

/** Pure-JVM brotli (RFC 7932) DECODER — `Content-Encoding: br` is the
  * second-most-common coding on the modern web and was this engine's
  * one undecodable wire form (r17 verdict item 5: every br response
  * dropped to the loud `br!undecoded` label, correctly counted but
  * lost text). The JVM ships no brotli; zero-egress forbids a
  * dependency; the format is fully public — so this implements the
  * RFC: stream/metablock headers, simple + complex prefix codes with
  * the code-length code (RLE 16/17, space accounting), block
  * categories with switch commands, context modes and context maps
  * (RLE + inverse-MTF), the 704-symbol insert&copy command alphabet,
  * the postfix/direct distance model with the 4-slot distance ring,
  * backward copies, and static-dictionary references with all 121
  * word transforms (Identity / Ferment / Omit ± affixes).
  *
  * NORMATIVE TABLES (the static dictionary is RFC 7932 Appendix A,
  * the transforms Appendix B, the literal-context lookup table
  * §7.1's, the block-count ranges §6's) load from the bundled
  * resource `graft/brotli_tables.bin`, extracted from the published
  * spec data by `tools/extract_brotli_tables.py` — the Vp8Tables
  * provenance discipline. Correctness is pinned DIFFERENTIALLY:
  * BrotliSpec decodes reference-encoder streams (quality 0–11,
  * window 10–24, dictionary-heavy/UTF-8/incompressible/repetitive
  * payloads, `tools/gen_brotli_vectors.py`) and demands bit-exact
  * payload recovery.
  *
  * Posture: hostile bytes in, `null` out on ANY malformation (never
  * a throw past the boundary); output fenced at `maxOut` with the
  * distinct [[Brotli.OverFence]] sentinel ([[Warc.decodeHttpPayload]]
  * maps it to the `br!over_fence` label). No shared mutable state —
  * safe inside executor flatMap kernels. */
object Brotli {

  /** Over-fence sentinel (identity-compared), mirroring
    * [[Warc]]'s tri-state decoder convention. */
  val OverFence: Array[Byte] = new Array[Byte](0)

  // ==== normative tables (bundled public spec data) ==================

  private final class Tables(
      val sizeBits: Array[Int],        // dictionary words per length
      val dictOffsets: Array[Int],     // derived cumulative offsets
      val contextLut: Array[Byte],     // 4 modes x (Lut0 | Lut1)
      val blockLenOffset: Array[Int],  // 26 block-count code ranges
      val blockLenBits: Array[Int],
      val tPrefix: Array[Array[Byte]], // 121 transforms
      val tType: Array[Int],
      val tSuffix: Array[Array[Byte]],
      val dict: Array[Byte])

  private lazy val T: Tables = {
    val in = getClass.getResourceAsStream("/graft/brotli_tables.bin")
    require(in != null, "brotli_tables.bin resource missing")
    val bytes = try in.readAllBytes() finally in.close()
    var p = 0
    val sizeBits = Array.tabulate(32)(i => bytes(i).toInt); p = 32
    val ctx = java.util.Arrays.copyOfRange(bytes, p, p + 2048); p += 2048
    val blo = new Array[Int](26); val blb = new Array[Int](26)
    var i = 0
    while (i < 26) {
      blo(i) = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      blb(i) = bytes(p + 2) & 0xff
      p += 3; i += 1
    }
    val nt = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff); p += 2
    val tp = new Array[Array[Byte]](nt)
    val tt = new Array[Int](nt)
    val ts = new Array[Array[Byte]](nt)
    i = 0
    while (i < nt) {
      val pl = bytes(p) & 0xff; p += 1
      tp(i) = java.util.Arrays.copyOfRange(bytes, p, p + pl); p += pl
      tt(i) = bytes(p) & 0xff; p += 1
      val sl = bytes(p) & 0xff; p += 1
      ts(i) = java.util.Arrays.copyOfRange(bytes, p, p + sl); p += sl
      i += 1
    }
    val ds = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
      ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    p += 4
    val dict = java.util.Arrays.copyOfRange(bytes, p, p + ds)
    // offsets derive from sizeBits: offset grows by (len << bits[len])
    val off = new Array[Int](32)
    var acc = 0
    i = 0
    while (i < 32) { off(i) = acc; if (sizeBits(i) > 0) acc += i << sizeBits(i); i += 1 }
    new Tables(sizeBits, off, ctx, blo, blb, tp, tt, ts, dict)
  }

  // transform type ids (the extractor's TYPES enumeration)
  private val TIdentity = 0
  private val TFermentFirst = 1
  private val TFermentAll = 2
  // 3 + 2*(k-1) = omit_first_k ; 4 + 2*(k-1) = omit_last_k (k = 1..9)

  /** Malformed-stream escape; caught at the [[decode]] boundary. */
  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt
  /** Output-fence escape, distinct from corruption. */
  private final class Fence extends RuntimeException(null, null, false, false)

  // ==== LSB-first bit reader =========================================

  private final class Reader(b: Array[Byte]) {
    private var pos = 0      // next byte
    private var bitBuf = 0L  // buffered bits, LSB = next bit
    private var bitCnt = 0
    def readBits(n: Int): Int = {
      while (bitCnt < n) {
        if (pos >= b.length) corrupt()
        bitBuf |= (b(pos) & 0xffL) << bitCnt
        pos += 1; bitCnt += 8
      }
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n; bitCnt -= n
      v
    }
    def readBit(): Int = readBits(1)
    /** Next `n` stream bits WITHOUT consuming, or -1 when fewer than
      * `n` remain (the caller falls back to the bit-serial decode,
      * which raises the honest corrupt() on a true underrun). */
    def peekBits(n: Int): Int = {
      while (bitCnt < n && pos < b.length) {
        bitBuf |= (b(pos) & 0xffL) << bitCnt
        pos += 1; bitCnt += 8
      }
      if (bitCnt < n) -1 else (bitBuf & ((1L << n) - 1)).toInt
    }
    def consume(n: Int): Unit = { bitBuf >>>= n; bitCnt -= n }
    /** Drop bits to the next byte boundary (uncompressed-metablock /
      * metadata alignment; the spec wants zeros, hostile nonzero is
      * tolerated — never a throw for padding). */
    def alignByte(): Unit = { val r = bitCnt & 7; if (r > 0) readBits(r) }
    /** Raw bytes after alignment (uncompressed metablocks; the
      * buffered whole bytes drain first). */
    def readRaw(dst: Out, n: Int): Unit = {
      var k = n
      while (k > 0 && bitCnt >= 8) {
        dst.put((bitBuf & 0xff).toByte); bitBuf >>>= 8; bitCnt -= 8; k -= 1
      }
      if (k > 0) {
        if (pos + k > b.length) corrupt()
        dst.putAll(b, pos, k); pos += k
      }
    }
    def skipBytes(n: Int): Unit = {
      var k = n
      while (k > 0 && bitCnt >= 8) { bitBuf >>>= 8; bitCnt -= 8; k -= 1 }
      if (k > 0) { if (pos + k > b.length) corrupt(); pos += k }
    }
  }

  /** Random-access growable output (backward copies read it). */
  private final class Out(fence: Int) {
    var buf = new Array[Byte](4096)
    var len = 0
    private def ensure(n: Int): Unit = {
      if (len + n > fence) throw new Fence
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap.toLong, fence.toLong + 8).toInt)
      }
    }
    def put(x: Byte): Unit = { ensure(1); buf(len) = x; len += 1 }
    def putAll(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, off, buf, len, n); len += n
    }
    /** Overlap-safe backward copy. */
    def copyBack(dist: Int, n: Int): Unit = {
      ensure(n)
      var s = len - dist
      var d = len
      var k = n
      while (k > 0) { buf(d) = buf(s); s += 1; d += 1; k -= 1 }
      len += n
    }
    def p1: Int = if (len > 0) buf(len - 1) & 0xff else 0
    def p2: Int = if (len > 1) buf(len - 2) & 0xff else 0
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  // ==== canonical prefix codes =======================================

  /** Canonical prefix code over (length, symbol), decoded bit-serial
    * MSB-first (the DEFLATE convention brotli shares). A code with
    * exactly one used symbol reads ZERO bits. */
  private final class Prefix(lens: Array[Int], alphabet: Int) {
    private val maxLen = {
      var m = 0; var i = 0
      while (i < alphabet) { if (lens(i) > m) m = lens(i); i += 1 }
      m
    }
    private val count = new Array[Int](maxLen + 1)
    private val firstCode = new Array[Int](maxLen + 1)
    private val firstIdx = new Array[Int](maxLen + 1)
    private val syms: Array[Int] = {
      var i = 0
      while (i < alphabet) { if (lens(i) > 0) count(lens(i)) += 1; i += 1 }
      var code = 0; var idx = 0; var l = 1
      while (l <= maxLen) {
        firstCode(l) = code; firstIdx(l) = idx
        code = (code + count(l)) << 1; idx += count(l); l += 1
      }
      val s = new Array[Int](idx)
      val next = new Array[Int](maxLen + 1)
      i = 0
      while (i < alphabet) {
        val ln = lens(i)
        if (ln > 0) { s(firstIdx(ln) + next(ln)) = i; next(ln) += 1 }
        i += 1
      }
      s
    }
    private val single: Int = if (syms.length == 1) syms(0) else -1
    // Peek-table fast path (the DEFLATE trick): one table lookup over
    // the next `tbits` stream bits decodes any code of length ≤ tbits
    // — which is nearly every symbol in real streams (literals and
    // commands cluster under 8 bits). Codes are MSB-first over the
    // LSB-first bit stream, so entries key on the BIT-REVERSED code
    // plus all filler suffixes. Longer codes (and near-EOF windows)
    // fall back to the exact bit-serial walk. Entry layout:
    // (len << 16) | symbol; 0 = no code of length ≤ tbits here.
    private val tbits = math.min(maxLen, 8)
    private val table: Array[Int] =
      if (single >= 0 || maxLen == 0) null
      else {
        val t = new Array[Int](1 << tbits)
        var l = 1
        while (l <= tbits) {
          var k = 0
          while (k < count(l)) {
            val code = firstCode(l) + k
            var rev = 0
            var j = 0
            while (j < l) { rev = (rev << 1) | ((code >>> j) & 1); j += 1 }
            val entry = (l << 16) | syms(firstIdx(l) + k)
            var f = 0
            while (f < (1 << (tbits - l))) {
              t(rev | (f << l)) = entry
              f += 1
            }
            k += 1
          }
          l += 1
        }
        t
      }
    def read(r: Reader): Int = {
      if (single >= 0) return single
      val idx = r.peekBits(tbits)
      if (idx >= 0) {
        val e = table(idx)
        if (e != 0) { r.consume(e >>> 16); return e & 0xffff }
      }
      var code = 0; var l = 1
      while (l <= maxLen) {
        code = (code << 1) | r.readBit()
        val c = count(l)
        if (c > 0 && code - firstCode(l) < c)
          return syms(firstIdx(l) + code - firstCode(l))
        l += 1
      }
      corrupt()
    }
  }

  private def log2ceil(n: Int): Int =
    if (n <= 1) 0 else 32 - Integer.numberOfLeadingZeros(n - 1)

  /** The RFC §3.5 fixed code for code-length code lengths, decoded
    * bit-serial: 00→0, 10→4, 01→3, 11+0→2, 11+10→1, 11+11→5
    * (bit order as read LSB-first from the stream). */
  private def readClcSymbol(r: Reader): Int = r.readBits(2) match {
    case 0 => 0
    case 1 => 4
    case 2 => 3
    case _ => if (r.readBit() == 0) 2 else if (r.readBit() == 0) 1 else 5
  }

  private val ClcOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** §3.4/3.5: one prefix code over `alphabet` symbols. */
  private def readPrefixCode(r: Reader, alphabet: Int): Prefix = {
    val two = r.readBits(2)
    if (two == 1) {
      // SIMPLE: 1-4 explicit symbols
      val nsym = r.readBits(2) + 1
      val bits = log2ceil(alphabet)
      val symbols = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        val s = if (bits == 0) 0 else r.readBits(bits)
        if (s >= alphabet) corrupt()
        var j = 0
        while (j < i) { if (symbols(j) == s) corrupt(); j += 1 }
        symbols(i) = s; i += 1
      }
      val lens = new Array[Int](alphabet)
      nsym match {
        case 1 => lens(symbols(0)) = 1 // Prefix's single path: 0 bits
        case 2 => lens(symbols(0)) = 1; lens(symbols(1)) = 1
        case 3 =>
          lens(symbols(0)) = 1; lens(symbols(1)) = 2; lens(symbols(2)) = 2
        case _ =>
          if (r.readBit() == 1) { // tree-select: lengths 1,2,3,3
            lens(symbols(0)) = 1; lens(symbols(1)) = 2
            lens(symbols(2)) = 3; lens(symbols(3)) = 3
          } else {
            var k = 0
            while (k < 4) { lens(symbols(k)) = 2; k += 1 }
          }
      }
      new Prefix(lens, alphabet)
    } else {
      // COMPLEX: code-length code, leading `two` order slots skipped
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = two
      while (i < 18 && space > 0) {
        val l = readClcSymbol(r)
        clLens(ClcOrder(i)) = l
        if (l != 0) { space -= 32 >> l; numCodes += 1 }
        i += 1
      }
      if (space < 0 || !(numCodes == 1 || space == 0)) corrupt()
      val clCode = new Prefix(clLens, 18)
      // symbol code lengths under the CL code, with the 16/17 RLE
      // accumulation and 2^15 space accounting
      val lens = new Array[Int](alphabet)
      var symbol = 0
      var space2 = 32768
      var prevLen = 8
      var repeat = 0
      var repeatLen = -1
      while (symbol < alphabet && space2 > 0) {
        val code = clCode.read(r)
        if (code < 16) {
          repeat = 0; repeatLen = -1
          lens(symbol) = code; symbol += 1
          if (code != 0) { prevLen = code; space2 -= 32768 >> code }
        } else {
          val extra = code - 14 // 16→2, 17→3
          val newLen = if (code == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extra }
          repeat += r.readBits(extra) + 3
          val delta = repeat - oldRepeat
          if (symbol + delta > alphabet) corrupt()
          var k = 0
          while (k < delta) { lens(symbol) = repeatLen; symbol += 1; k += 1 }
          if (repeatLen != 0) space2 -= delta << (15 - repeatLen)
        }
      }
      if (space2 < 0) corrupt()
      var nonzero = 0
      var j = 0
      while (j < alphabet) { if (lens(j) > 0) nonzero += 1; j += 1 }
      if (nonzero == 0) corrupt()
      if (nonzero > 1 && space2 != 0) corrupt()
      new Prefix(lens, alphabet)
    }
  }

  /** §9.2's variable-length block-type count (1..256). */
  private def readVarLenCount(r: Reader): Int =
    if (r.readBit() == 0) 1
    else {
      val n = r.readBits(3)
      if (n == 0) 2 else r.readBits(n) + (1 << n) + 1
    }

  /** §7.3 context map: RLE of zeros + inverse move-to-front. */
  private def readContextMap(r: Reader, size: Int, nTrees: Int): Array[Int] = {
    val map = new Array[Int](size)
    if (nTrees <= 1) return map
    val rleMax = if (r.readBit() == 1) r.readBits(4) + 1 else 0
    val code = readPrefixCode(r, nTrees + rleMax)
    var i = 0
    while (i < size) {
      val sym = code.read(r)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        var reps = (1 << sym) + r.readBits(sym)
        if (i + reps > size) corrupt()
        while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
      } else {
        if (sym - rleMax >= nTrees) corrupt()
        map(i) = sym - rleMax; i += 1
      }
    }
    if (r.readBit() == 1) { // inverse move-to-front over the values
      val mtf = Array.tabulate(256)(identity)
      var k = 0
      while (k < size) {
        val idx = map(k)
        val v = mtf(idx)
        var m = idx
        while (m > 0) { mtf(m) = mtf(m - 1); m -= 1 }
        mtf(0) = v
        map(k) = v
        k += 1
      }
    }
    map
  }

  // ==== command alphabet (§5) ========================================

  private val InsRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CpyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)
  private val InsExtra =
    Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val InsBase =
    Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
      322, 578, 1090, 2114, 6210, 22594)
  private val CpyExtra =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val CpyBase =
    Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
      134, 198, 326, 582, 1094, 2118)

  // distance short codes (§4): ring index offset + value delta
  private val ShortIdxOff = Array(3, 2, 1, 0, 3, 3, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2)
  private val ShortValOff = Array(0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1, 1, -2, 2, -3, 3)

  // ==== word transforms (§8 / Appendix B) ============================

  /** RFC 7932 "ferment" — UTF-8-aware uppercasing used by the
    * transform types; mirrors the spec's byte rules exactly. */
  private def ferment(w: Array[Byte], from: Int, len: Int,
                      upperAll: Boolean, out: Out): Unit = {
    val tmp = java.util.Arrays.copyOfRange(w, from, from + len)
    var i = 0
    var done = false
    while (i < tmp.length && !done) {
      val c = tmp(i) & 0xff
      if (c < 192) {
        if (c >= 97 && c <= 122) tmp(i) = (c ^ 32).toByte
        i += 1
      } else if (c < 224) {
        if (i + 1 < tmp.length) tmp(i + 1) = (tmp(i + 1) ^ 32).toByte
        i += 2
      } else {
        if (i + 2 < tmp.length) tmp(i + 2) = (tmp(i + 2) ^ 5).toByte
        i += 3
      }
      if (!upperAll) done = true
    }
    out.putAll(tmp, 0, tmp.length)
  }

  /** Emit transform `t` of dictionary word [off, off+len); returns
    * the emitted byte count. */
  private def emitTransformed(t: Int, off: Int, len: Int, out: Out): Int = {
    val before = out.len
    val pre = T.tPrefix(t)
    out.putAll(pre, 0, pre.length)
    val ty = T.tType(t)
    if (ty == TIdentity) out.putAll(T.dict, off, len)
    else if (ty == TFermentFirst) ferment(T.dict, off, len, upperAll = false, out)
    else if (ty == TFermentAll) ferment(T.dict, off, len, upperAll = true, out)
    else {
      val k = (ty - 3) / 2 + 1
      if ((ty - 3) % 2 == 0) { // omit_first_k
        if (k < len) out.putAll(T.dict, off + k, len - k)
      } else { // omit_last_k
        if (k < len) out.putAll(T.dict, off, len - k)
      }
    }
    val suf = T.tSuffix(t)
    out.putAll(suf, 0, suf.length)
    out.len - before
  }

  // ==== per-category block state =====================================

  private final class BlockState(r: Reader, val nTypes: Int) {
    var btype = 0
    private var prev = 1
    private val typeCode: Prefix =
      if (nTypes >= 2) readPrefixCode(r, nTypes + 2) else null
    private val lenCode: Prefix =
      if (nTypes >= 2) readPrefixCode(r, 26) else null
    var blen: Int =
      if (nTypes >= 2) readBlockLen(r) else Int.MaxValue
    private def readBlockLen(rr: Reader): Int = {
      val sym = lenCode.read(rr)
      T.blockLenOffset(sym) + rr.readBits(T.blockLenBits(sym))
    }
    /** Consume one element; switch block type when the count runs out. */
    def tick(rr: Reader): Unit = {
      if (blen == 0) {
        val sym = typeCode.read(rr)
        val nt = sym match {
          case 0 => prev
          case 1 => (btype + 1) % nTypes
          case _ => sym - 2
        }
        prev = btype; btype = nt
        blen = readBlockLen(rr)
      }
      if (blen != Int.MaxValue) blen -= 1
    }
  }

  // ==== the decoder ==================================================

  /** Encode a payload as VALID brotli using uncompressed metablocks
    * only (RFC 7932 §9.2's ISUNCOMPRESSED path) — the trivial but
    * fully conformant encoder: fixtures and sinks get real `br`
    * streams without an entropy coder, and any spec-correct decoder
    * (this one included) reads them. ~4 bytes overhead per 16 MiB
    * metablock. */
  def encodeUncompressed(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 8)
    var bitBuf = 0
    var bitCnt = 0
    def put(v: Int, n: Int): Unit = {
      bitBuf |= (v & ((1 << n) - 1)) << bitCnt
      bitCnt += n
      while (bitCnt >= 8) { out.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
    }
    def align(): Unit =
      if (bitCnt > 0) { out.write(bitBuf & 0xff); bitBuf = 0; bitCnt = 0 }
    put(0, 1) // WBITS = 16
    var p = 0
    while (p < payload.length) {
      val n = math.min(payload.length - p, 1 << 24)
      put(0, 1) // ISLAST = 0 (uncompressed blocks require it)
      val nibbles = if (n <= (1 << 16)) 4 else if (n <= (1 << 20)) 5 else 6
      put(nibbles - 4, 2)
      put(n - 1, 4 * nibbles)
      put(1, 1) // ISUNCOMPRESSED
      align()
      out.write(payload, p, n)
      p += n
    }
    put(1, 1); put(1, 1) // ISLAST + ISLASTEMPTY
    align()
    out.toByteArray
  }

  /** Decode one complete brotli stream. Returns the payload, `null`
    * on any malformation, [[OverFence]] when the output exceeds
    * `maxOut`. */
  def decode(bytes: Array[Byte], maxOut: Int): Array[Byte] = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val r = new Reader(bytes)
      // stream header: window bits
      val wbits =
        if (r.readBit() == 0) 16
        else {
          val n = r.readBits(3)
          if (n != 0) 17 + n
          else {
            val m = r.readBits(3)
            if (m == 0) 17
            else if (m == 1) corrupt() // reserved (large-window extension)
            else 8 + m
          }
        }
      val maxBackward = (1 << wbits) - 16
      val out = new Out(maxOut)
      val ring = Array(16, 15, 11, 4)
      var ringIdx = 0

      var isLast = false
      while (!isLast) {
        isLast = r.readBit() == 1
        if (isLast && r.readBit() == 1) {
          // ISLASTEMPTY
        } else {
          val nibCode = r.readBits(2)
          if (nibCode == 3) {
            // metadata metablock: skip
            if (isLast) corrupt()
            if (r.readBit() == 1) corrupt() // reserved
            val skipBytes = r.readBits(2)
            val skipLen =
              if (skipBytes == 0) 0
              else {
                val v = r.readBits(8 * skipBytes)
                if (skipBytes > 1 && (v >>> (8 * (skipBytes - 1))) == 0)
                  corrupt() // non-minimal length encoding
                v + 1
              }
            r.alignByte()
            r.skipBytes(skipLen)
          } else {
            val nibbles = 4 + nibCode
            val mlenM1 = r.readBits(4 * nibbles)
            if (nibbles > 4 && (mlenM1 >>> (4 * (nibbles - 1))) == 0)
              corrupt() // non-minimal nibble count
            var remaining = mlenM1 + 1
            val uncompressed = !isLast && r.readBit() == 1
            if (uncompressed) {
              r.alignByte()
              r.readRaw(out, remaining)
            } else {
              // --- compressed metablock header ---
              val bsL = new BlockState(r, readVarLenCount(r))
              val bsI = new BlockState(r, readVarLenCount(r))
              val bsD = new BlockState(r, readVarLenCount(r))
              val npostfix = r.readBits(2)
              val ndirect = r.readBits(4) << npostfix
              val cmodes = new Array[Int](bsL.nTypes)
              var i = 0
              while (i < bsL.nTypes) { cmodes(i) = r.readBits(2); i += 1 }
              val nTreesL = readVarLenCount(r)
              val cmapL = readContextMap(r, bsL.nTypes << 6, nTreesL)
              val nTreesD = readVarLenCount(r)
              val cmapD = readContextMap(r, bsD.nTypes << 2, nTreesD)
              val litCodes = Array.fill(nTreesL)(readPrefixCode(r, 256))
              val cmdCodes = Array.fill(bsI.nTypes)(readPrefixCode(r, 704))
              val distAlphabet = 16 + ndirect + (48 << npostfix)
              val distCodes = Array.fill(nTreesD)(readPrefixCode(r, distAlphabet))

              // --- command loop ---
              while (remaining > 0) {
                bsI.tick(r)
                val cmd = cmdCodes(bsI.btype).read(r)
                var rangeIdx = cmd >>> 6
                val implicitD0 = rangeIdx < 2
                if (!implicitD0) rangeIdx -= 2
                val insCode = InsRangeLut(rangeIdx) + ((cmd >>> 3) & 7)
                val cpyCode = CpyRangeLut(rangeIdx) + (cmd & 7)
                var ilen = InsBase(insCode) + r.readBits(InsExtra(insCode))
                val clen = CpyBase(cpyCode) + r.readBits(CpyExtra(cpyCode))
                if (ilen > remaining) corrupt()
                remaining -= ilen
                while (ilen > 0) {
                  bsL.tick(r)
                  val mode = cmodes(bsL.btype)
                  val ctx = (T.contextLut((mode << 9) | out.p1) & 0xff) |
                    (T.contextLut((mode << 9) | 256 | out.p2) & 0xff)
                  val tree = cmapL((bsL.btype << 6) | ctx)
                  out.put(litCodes(tree).read(r).toByte)
                  ilen -= 1
                }
                if (remaining > 0) {
                  val maxDist = math.min(out.len, maxBackward)
                  var distance = 0
                  var pushToRing = false
                  if (implicitD0) {
                    distance = ring((ringIdx + 3) & 3)
                  } else {
                    bsD.tick(r)
                    val distCtx = math.min(clen - 2, 3) // clen >= 2
                    val tree = cmapD((bsD.btype << 2) | distCtx)
                    val dcode = distCodes(tree).read(r)
                    if (dcode < 16) {
                      distance =
                        ring((ringIdx + ShortIdxOff(dcode)) & 3) +
                          ShortValOff(dcode)
                      if (distance <= 0) corrupt()
                      pushToRing = dcode != 0
                    } else if (dcode < 16 + ndirect) {
                      distance = dcode - 16 + 1
                      pushToRing = true
                    } else {
                      val x = dcode - ndirect - 16
                      val ndistbits = 1 + (x >>> (npostfix + 1))
                      if (ndistbits > 24) corrupt()
                      val extra = r.readBits(ndistbits)
                      val hcode = x >>> npostfix
                      val lcode = x & ((1 << npostfix) - 1)
                      val offset = ((2 + (hcode & 1)) << ndistbits) - 4
                      distance =
                        ((offset + extra) << npostfix) + lcode + ndirect + 1
                      pushToRing = true
                    }
                  }
                  if (distance <= maxDist) {
                    if (clen > remaining) corrupt()
                    out.copyBack(distance, clen)
                    remaining -= clen
                    if (pushToRing) {
                      ring(ringIdx & 3) = distance; ringIdx += 1
                    }
                  } else {
                    // static dictionary reference (never pushed to ring)
                    if (clen < 4 || clen > 24 || T.sizeBits(clen) == 0) corrupt()
                    val wordId = distance - maxDist - 1
                    val index = wordId & ((1 << T.sizeBits(clen)) - 1)
                    val transformId = wordId >>> T.sizeBits(clen)
                    if (transformId >= T.tType.length) corrupt()
                    val off = T.dictOffsets(clen) + index * clen
                    val emitted = emitTransformed(transformId, off, clen, out)
                    if (emitted > remaining) corrupt()
                    remaining -= emitted
                  }
                }
              }
            }
          }
        }
      }
      out.result()
    } catch {
      case _: Fence => OverFence
      case _: Corrupt => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }
  }
}
