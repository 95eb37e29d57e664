package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token+gram rows for [[graft.llm.ExactSubstring]] in
  * ONE native pass (`token_grams`): element i of the result is the
  * document's i-th NON-EMPTY single-space token (1-based once
  * posexploded) paired with the 16-byte MD5 of the `minRun`-token
  * gram starting there (null when fewer than `minRun` tokens
  * remain) — exactly the r19 column tier's
  * `split → filter('' ) → row_number window → minRun−1 lead windows →
  * md5(concat_ws(" ", …))` chain, whose TWO per-document window
  * passes (a row-number sort plus a lead sort materializing minRun
  * copies of every token) shuffled and sorted the full token table
  * before the first real aggregate (optimization r20, guide §2.4 —
  * positions and grams are per-document facts, so they belong in the
  * map pass). The gram key is the RAW md5 digest (16 bytes) where
  * the column tier carried the 32-char hex form — the key never
  * leaves the operator, so only the exchange width changes. Null
  * in → null out; differential-pinned by ExactSubstringSpec.
  */
case class TokenGrams(child: Expression, minRun: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w", StringType, nullable = false),
      StructField("gh", BinaryType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "token_grams"

  override def nullSafeEval(input: Any): Any = {
    val toks0 = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    var n = 0
    val words = new Array[Array[Byte]](toks0.length)
    val utf = new Array[UTF8String](toks0.length)
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) {
        words(n) = toks0(i).getBytes("UTF-8")
        utf(n) = UTF8String.fromBytes(words(n))
        n += 1
      }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val gh: Array[Byte] =
        if (i + minRun <= n) {
          md.reset()
          var k = i
          while (k < i + minRun) {
            if (k > i) md.update(' '.toByte)
            md.update(words(k))
            k += 1
          }
          md.digest()
        } else null
      out(i) = new GenericInternalRow(Array[Any](utf(i), gh))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenGrams {
  def apply(text: Column, minRun: Int): Column =
    ColumnBridge.column(TokenGrams(ColumnBridge.expression(text), minRun))
}
