package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key for multi-dimensional data clustering —
  * the layout primitive behind Delta/Iceberg OPTIMIZE ZORDER BY,
  * reimplemented as a pure Catalyst column expression: sort a table by
  * the bit-interleaved key of two dimensions and every output file
  * covers a compact hyper-rectangle in BOTH dimensions at once, so
  * parquet min/max footer stats prune scans filtered on EITHER
  * dimension (a single-column sort buys skipping on that column only;
  * Z-order buys it on all interleaved columns simultaneously — the
  * difference between one fast predicate and a fast predicate per
  * dimension at 100 TB).
  *
  * Everything is integer arithmetic over codegen'd built-ins
  * (shiftleft/shiftright/bitwiseAND/OR — the SimHash packing
  * pattern), so the key is cheap, deterministic, and has an exact
  * DuckDB twin for the oracle.
  */
object ZOrder {

  /** Order-preserving quantization of a nonnegative integer column
    * onto [0, 2^bits): floor(v·2^bits / (maxV+1)). The double
    * division is exact-enough by construction: v·2^bits < 2^53 keeps
    * the numerator exactly representable, and the true rational is
    * never within 1/(maxV+1) of an integer boundary while a double
    * division errs by at most ~2^-37 of the quotient — so the floor
    * can never land on the wrong side. `maxV` rides in as a column
    * (a broadcast one-row aggregate), keeping the whole key plan-time
    * free of driver-side actions. */
  def quantize(v: Column, maxV: Column, bits: Int = 16): Column =
    floor((v * (1L << bits)).cast("double") / (maxV + 1)).cast("long")

  /** Bit-interleaved Z-value of two already-quantized columns: bit i
    * of x lands at position 2i, bit i of y at 2i+1. 2·bits total
    * output bits (32 for the default — well inside BIGINT on both
    * engines). */
  def zValue(xq: Column, yq: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(xq, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yq, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as SQL text (for the DuckDB oracle twin) over
    * pre-quantized expressions `xq`, `yq`. */
  def zValueSql(xq: String, yq: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($xq >> $i) & 1) << ${2 * i}) | ((($yq >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
