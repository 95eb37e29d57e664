package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch hot loops.
  *
  * The `Column`-tier sketches in [[graft.llm.Dedup]] are built from
  * higher-order functions (`aggregate`/`zip_with`), which evaluate
  * interpreted and allocate an array per element — fine for
  * correctness, ~10× too slow for a 100 TB corpus scan. These
  * expressions do the same math as one JIT-compiled primitive loop per
  * row (CodegenFallback costs one virtual call per row; the loop body
  * itself is plain JVM code).
  */

/** MinHash signature from a 31-bit shingle-hash array:
  * sig[i] = min over shingles of (a_i·h + b_i) mod p, p = 2^31-1.
  * Empty input → all-sentinel (p) signature, matching the fold tier.
  *
  * The modulus must be ~the same width as the inputs: with a, b, h all
  * < 2^31, the product a·h (< 2^62) wraps the 2^31-1 modulus ~2^31
  * times, giving proper avalanche. (An earlier p = 2^61-1 wrapped at
  * most twice, leaving v nearly monotonic in h — the min was then
  * always attained by the numerically smallest shingle hashes and all
  * 64 components were correlated, wrecking the Jaccard estimate.) */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  private val p = (1L << 31) - 1
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = a.length
    val sig = Array.fill(k)(p)
    val aArr = a.toArray; val bArr = b.toArray
    var j = 0
    while (j < arr.numElements()) {
      // null elements (possible from arbitrary SQL input) are skipped
      if (arr.isNullAt(j)) { j += 1 }
      else {
      val h = arr.getLong(j); var i = 0
      while (i < k) {
        val v = (aArr(i) * h + bArr(i)) % p
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
      }
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash from a token array: per bit, majority vote of 64-bit
  * FNV-1a token hashes. One pass over tokens, primitive counters. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (toks.isNullAt(j)) { j += 1 } // skip null tokens (SQL input)
      else {
      val bytes = toks.getUTF8String(j).getBytes
      // FNV-1a 64-bit
      var h = 0xcbf29ce484222325L
      var bi = 0
      while (bi < bytes.length) { h ^= (bytes(bi) & 0xffL); h *= 0x100000001b3L; bi += 1 }
      var i = 0
      while (i < 64) { if (((h >>> i) & 1L) != 0L) counts(i) += 1 else counts(i) -= 1; i += 1 }
      j += 1
      }
    }
    var out = 0L; var i = 0
    while (i < 64) { if (counts(i) >= 0) out |= (1L << i); i += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct 31-bit hashes of word n-gram shingles, straight from the
  * text: tokenize on single spaces, hash each n-token window with
  * FNV-1a (tokens separated by NUL), dedup in a hash set. Never
  * materializes shingle strings — the dominant cost of the
  * `transform`+`concat_ws` column tier (~20× slower at corpus scale). */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    if (toks.length < n) new GenericArrayData(Array.emptyLongArray)
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= toks.length - n) {
        var h = 0xcbf29ce484222325L
        var k = 0
        while (k < n) {
          val bytes = toks(i + k).getBytes("UTF-8")
          var bi = 0
          while (bi < bytes.length) { h ^= (bytes(bi) & 0xffL); h *= 0x100000001b3L; bi += 1 }
          h ^= 0L; h *= 0x100000001b3L // NUL separator between tokens
          k += 1
        }
        seen.add(h & 0x7FFFFFFFL)
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator(); var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SketchExpressions {
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  def minHashSignature(hashes: Column, a: Seq[Long], b: Seq[Long]): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), a, b))

  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
