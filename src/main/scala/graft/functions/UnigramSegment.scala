package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-class) segmentation with a baked-in
  * vocabulary — the Viterbi E-step of hard-EM unigram training, made
  * ORACLE-EXACT: instead of float log-probabilities the DP optimizes
  * the integer triple (fewest pieces, then largest total piece
  * frequency, then lexicographically smallest piece sequence), so
  * two engines computing it independently agree bit-for-bit. The
  * objective is the integer skeleton of the real thing — maximizing
  * Σ log p(piece) under a size budget — with every tie broken
  * deterministically.
  *
  * Coverage is total: any single character missing from the
  * vocabulary acts as an implicit piece of frequency 0 (the unknown
  * fallback), so every space-free string segments. Pieces must be
  * space-free — the lexicographic tie-break compares the
  * space-joined sequence, which equals element-wise sequence order
  * exactly when ' ' sorts below every piece character (it does, for
  * the split-on-space word tables this serves).
  *
  * One DP pass per word: O(len · maxPieceLen) states, the joined
  * suffix strings bound the tie-break cost at O(len²) chars. The
  * vocabulary lives in instance state (the [[BpeSegment]] posture):
  * plan depth O(1) at any vocabulary size. */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression with UnaryKernelCodegen {

  vocab.foreach { case (p, f) =>
    require(p.nonEmpty && !p.contains(' '),
      s"UnigramSegment: piece must be non-empty and space-free: '$p'")
    require(f >= 0, s"UnigramSegment: negative frequency for '$p'")
  }

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, f) => m.put(p, java.lang.Long.valueOf(f)) }
    m
  }
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else math.max(1, vocab.map(_._1.length).max)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val pieces = UnigramSegment.segment(w, table, maxLen)
    val arr = new Array[Any](pieces.length)
    var i = 0
    while (i < pieces.length) { arr(i) = UTF8String.fromString(pieces(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnigramSegment {
  def apply(word: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramSegment(ColumnBridge.expression(word), vocab))

  /** The DP (see class doc). Package-visible for the differential
    * spec against brute-force enumeration. */
  private[graft] def segment(w: String,
                             table: java.util.HashMap[String, java.lang.Long],
                             maxLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    // best segmentation of the suffix starting at i
    val bn = new Array[Int](n + 1)      // piece count
    val bf = new Array[Long](n + 1)     // total frequency
    val bj = new Array[String](n + 1)   // space-joined pieces (tie-break)
    val bp = new Array[Int](n + 1)      // chosen piece length at i
    bj(n) = ""
    var i = n - 1
    while (i >= 0) {
      var bestN = Int.MaxValue
      var bestF = Long.MinValue
      var bestJ: String = null
      var bestL = 1
      var L = 1
      val lim = math.min(maxLen, n - i)
      while (L <= lim) {
        val piece = w.substring(i, i + L)
        val f0 = table.get(piece)
        val hit = f0 != null || L == 1 // single chars fall back at freq 0
        if (hit) {
          val f = if (f0 == null) 0L else f0.longValue()
          val cn = 1 + bn(i + L)
          val cf = f + bf(i + L)
          lazy val cj = if (bj(i + L).isEmpty) piece else piece + " " + bj(i + L)
          val better =
            cn < bestN || (cn == bestN && (cf > bestF ||
              (cf == bestF && (bestJ == null || cj < bestJ))))
          if (better) { bestN = cn; bestF = cf; bestJ = cj; bestL = L }
        }
        L += 1
      }
      bn(i) = bestN; bf(i) = bestF; bj(i) = bestJ; bp(i) = bestL
      i -= 1
    }
    val out = Array.newBuilder[String]
    var p = 0
    while (p < n) { out += w.substring(p, p + bp(p)); p += bp(p) }
    out.result()
  }
}
