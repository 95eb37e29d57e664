package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data
  * clustering — the lakehouse layout trick: sorting by the
  * bit-interleaved key keeps rows close in BOTH dimensions close in
  * file order, so per-file min/max ranges are tight on every
  * dimension and a scan filtered on either column skips files. A
  * linear sort clusters only its leading column; z-order trades a
  * little locality on each dimension for locality on all of them.
  *
  * Built entirely from codegen'd bit built-ins (shiftright/and/
  * shiftleft/sum) — no UDF, no custom expression; the interleave is
  * a constant-folded 2·bits-term arithmetic expression inside
  * whole-stage codegen.
  */
object ZOrder {

  /** Morton code of (x, y): bit j of x lands at position 2j, bit j of
    * y at 2j+1. Bits above `bits` are DROPPED (callers pick `bits` to
    * cover their key range; 21 bits each keeps the code < 2^42, far
    * from long overflow). Negative inputs are rejected in-plan. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    val checked = (c: Column) => when(c < 0,
      raise_error(lit(s"zValue: negative key"))).otherwise(c).cast("long")
    val (cx, cy) = (checked(x), checked(y))
    val terms = (0 until bits).flatMap { j =>
      Seq(shiftleft(shiftright(cx, j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(cy, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }
    terms.reduce(_ + _) // disjoint bit positions: + is exactly OR
  }

  /** Range-partition + sort `df` by the z-value of the two columns —
    * the write-side clustering pass. Range partitioning (not hash)
    * keeps the z-curve contiguous across output files, which is what
    * makes per-file min/max fences tight. */
  def cluster(df: DataFrame, xCol: String, yCol: String,
              numFiles: Int, bits: Int = 21): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
