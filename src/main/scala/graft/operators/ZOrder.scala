package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout key.
  *
  * The data-layout complement to partition pruning: sorting/bucketing
  * a table by the bit-interleaving of two (or more) dimension keys
  * gives every physical bucket a TIGHT min/max range in EVERY
  * interleaved dimension simultaneously, so file-level min/max stats
  * (parquet row-group stats, manifest files à la p4_shard_manifest)
  * prune scans for predicates on ANY of the dimensions — a single-
  * column sort only prunes its own leading column. Standard public
  * technique (Morton 1966; used by every lakehouse layout optimizer);
  * implementation is plain closed-form bit arithmetic.
  *
  * Scale shape: the z-value is a stateless per-row expression (four
  * shift-mask rounds per dimension, whole-stage codegen); laying out
  * 100 TB by z is one range-partitioned sort on a long key — the same
  * cost as any global sort, paid once at write time, repaid on every
  * subsequent multi-dimensional scan.
  */
object ZOrder {

  /** spread the low 16 bits of x to the even bit positions of a
    * 32-bit value (magic-number bit doubling). */
  def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of two 16-bit dimension keys
    * (x gets the even bits, y the odd bits). */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))
}
