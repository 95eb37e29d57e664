package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HEIF-family still images (AVIF / HEIC) — the ISOBMFF box walk for
  * the modern web's newest image container: `ftyp` major brand,
  * `meta` → `iinf` item count (both version forms), `meta` → `iprp`
  * → `ipco` → every `ispe` (image spatial extents) property, and the
  * primary dimensions reported as the LARGEST extent (thumbnails and
  * alpha auxiliaries are smaller by construction). Pixel decode
  * (AV1/HEVC intra frames) is the declared inter-frame-codec-class
  * non-goal — these are the container facts curation filters on,
  * the posture VP8 lossy had before q311.
  *
  * Same discipline as [[Multimodal.parseAvHeader]]'s MP4 walk: all
  * cursor math in Long against hostile u32/u64 sizes (size==1 →
  * 64-bit largesize, size==0 → to end of data), forward progress
  * floors, bounded property count, never a throw. Map-only. */
object Heif {

  /** ispe fence (hostile property lists). */
  val MaxIspe = 256

  final case class HeifInfo(brand: String, width: Long, height: Long,
                            nItems: Long, nIspe: Int)

  def looksLikeHeif(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p' && {
        val brand = new String(b, 8, 4, "US-ASCII")
        Set("avif", "avis", "heic", "heix", "hevc", "mif1", "msf1")
          .contains(brand)
      }

  def parseHeif(bytes: Array[Byte]): Option[HeifInfo] = {
    if (!looksLikeHeif(bytes)) return None
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Long): Int = (u8(i.toInt) << 8) | u8(i.toInt + 1)
    def be32(i: Long): Long =
      ((u8(i.toInt).toLong << 24) | (u8(i.toInt + 1).toLong << 16) |
        (u8(i.toInt + 2).toLong << 8) | u8(i.toInt + 3).toLong)
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Long): String =
      if (i + 4 <= bytes.length) new String(bytes, i.toInt, 4, "US-ASCII")
      else ""
    def boxBounds(o: Long): (Long, Long) = {
      val sz = be32(o)
      if (sz == 1 && o + 16 <= bytes.length)
        (o + 16, o + math.max(16L, be64(o + 8)))
      else if (sz == 0) (o + 8, bytes.length.toLong)
      else (o + 8, o + math.max(8L, sz))
    }
    val brand = new String(bytes, 8, 4, "US-ASCII")
    var nItems = 0L
    var nIspe = 0
    var bestW = 0L
    var bestH = 0L
    // children walk in [from, until): calls f(type, contentStart, boxEnd)
    def walk(from: Long, until: Long)(f: (String, Long, Long) => Unit): Unit = {
      var i = from
      while (i + 8 <= until && i + 8 <= bytes.length) {
        val (content, end0) = boxBounds(i)
        val end = math.min(end0, until)
        f(fourcc(i + 4), content, end)
        i = math.max(end0, i + 8) // hostile sizes still advance
      }
    }
    walk(0, bytes.length.toLong) { (t, c, e) =>
      if (t == "meta" && c + 4 <= e) {
        // meta is a FullBox: 4 bytes version/flags before children
        walk(c + 4, e) { (t2, c2, e2) =>
          if (t2 == "iinf" && c2 + 4 <= e2) {
            val version = u8(c2.toInt)
            if (version == 0 && c2 + 6 <= e2) nItems = be16(c2 + 4)
            else if (version > 0 && c2 + 8 <= e2) nItems = be32(c2 + 4)
          } else if (t2 == "iprp") {
            walk(c2, e2) { (t3, c3, e3) =>
              if (t3 == "ipco") {
                walk(c3, e3) { (t4, c4, e4) =>
                  if (t4 == "ispe" && c4 + 12 <= e4 && nIspe < MaxIspe) {
                    nIspe += 1
                    val w = be32(c4 + 4)
                    val h = be32(c4 + 8)
                    if (w * h > bestW * bestH) { bestW = w; bestH = h }
                  }
                }
              }
            }
          }
        }
      }
    }
    Some(HeifInfo(brand, bestW, bestH, nItems, nIspe))
  }

  // ---------------------------------------------------------- write

  /** Deterministic HEIF writer: ftyp(major brand) + meta FullBox
    * holding iinf (version 0) and iprp/ipco with one ispe per dim
    * pair. `largesize` emits meta with the size==1 / 64-bit form. */
  def buildHeif(brand: String, dims: Seq[(Long, Long)], nItems: Int,
                largesize: Boolean = false): Array[Byte] = {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    def bigBox(t: String, payload: Array[Byte]): Array[Byte] =
      be32(1L) ++ t.getBytes("US-ASCII") ++
        be32((16L + payload.length) >> 32) ++
        be32((16L + payload.length) & 0xffffffffL) ++ payload
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ be32(0) ++
      brand.getBytes("US-ASCII") ++ "mif1".getBytes("US-ASCII"))
    val iinf = box("iinf", Array[Byte](0, 0, 0, 0) ++ be16(nItems))
    val ispes = dims.map { case (w, h) =>
      box("ispe", Array[Byte](0, 0, 0, 0) ++ be32(w) ++ be32(h))
    }.foldLeft(Array.empty[Byte])(_ ++ _)
    val iprp = box("iprp", box("ipco", ispes))
    val metaPayload = Array[Byte](0, 0, 0, 0) ++ iinf ++ iprp
    val meta = if (largesize) bigBox("meta", metaPayload)
      else box("meta", metaPayload)
    ftyp ++ meta
  }

  // ------------------------------------------------------ dataframe

  /** One row per payload: brand, primary (largest-extent) width and
    * height, declared item count, ispe property count. Nulls for
    * non-HEIF payloads. */
  def describeHeif(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        parseHeif(p) match {
          case Some(h) => (id, Some(h.brand), Some(h.width), Some(h.height),
            Some(h.nItems), Some(h.nIspe))
          case None => (id, None: Option[String], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Int])
        }
      }
      .toDF("media_id", "brand", "width", "height", "n_items", "n_ispe")
  }
}
