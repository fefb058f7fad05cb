package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: interleave the bits of two 16-bit dimension
  * keys into one 32-bit sort key. Rows sorted/range-partitioned by the
  * z-value are clustered so that a filter on EITHER dimension touches a
  * small, contiguous set of files — the standard multi-dimensional
  * layout trick for big fact tables (z-ordering in Delta/Iceberg
  * compaction; Morton curves go back to IBM's 1966 file-sequencing
  * report). At 100 TB this is a write-time layout choice:
  * `df.repartitionByRange(N, zorder32(u, t)).sortWithinPartitions(...)`
  * gives every output file a tight z-range, so min/max file stats prune
  * scans on either dimension.
  *
  * Implementation is pure Column bit arithmetic (shift/and/or), so it
  * whole-stage-codegens with no UDF and mirrors 1:1 into the DuckDB
  * oracle; the magic-mask spreading is the classic "Interleave bits by
  * Binary Magic Numbers" technique (public-domain Bit Twiddling Hacks).
  * Inputs must already be reduced to 16 bits (caller masks/mods); all
  * intermediates stay < 2^32, so signed-64 math is overflow-safe in
  * both engines.
  */
object ZOrder {

  /** spread the low 16 bits of `c` into the even bit positions 0,2,..,30 */
  def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit z-value of two 16-bit keys: x in even bits, y in odd bits */
  def zorder32(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** the same spreading as DuckDB SQL text (same masks, same shifts) */
  def spread16Sql(e: String): String = {
    val s1 = s"((($e) | (($e) << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  def zorder32Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** reference bit-by-bit interleave, for specs */
  def reference(x: Int, y: Int): Long =
    (0 until 16).map(b =>
      (((x >> b) & 1).toLong << (2 * b)) |
        (((y >> b) & 1).toLong << (2 * b + 1))).sum
}
