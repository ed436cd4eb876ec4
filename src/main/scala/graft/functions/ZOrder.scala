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

  /** Output bit position of bit level `i` of dimension `d`, for
    * dimensions with (possibly unequal) per-dim bit budgets: levels
    * are consumed round-robin from the LSB, and a dimension whose
    * budget is exhausted simply drops out of later rounds. With equal
    * budgets this degenerates to the classic stride — bit i of dim d
    * at position n·i + d — and for ANY budgets a given dimension's
    * positions are strictly increasing in i, which is what makes the
    * key monotone per dimension (and envelope-narrowing per
    * dimension) below. Unequal budgets are the per-dim resolution
    * knob: give a high-cardinality filter column more bits and a
    * coarse one fewer, instead of paying every dimension the widest
    * dimension's width. */
  private def positions(budgets: Seq[Int]): Seq[Seq[Int]] = {
    val out = Array.fill(budgets.length)(List.empty[Int])
    var pos = 0
    for (i <- 0 until budgets.max; d <- budgets.indices if budgets(d) > i) {
      out(d) = pos :: out(d) // reversed: head = highest level
      pos += 1
    }
    out.map(_.reverse).toSeq
  }

  /** Bit-interleaved Z-value of n already-quantized columns with
    * per-dimension bit budgets. Total bits must fit a signed BIGINT
    * on both engines. */
  def zValueN(dims: Seq[(Column, Int)]): Column = {
    require(dims.nonEmpty && dims.map(_._2).sum <= 63,
      s"z-value needs 1..n dims totalling <= 63 bits, got ${dims.map(_._2)}")
    val pos = positions(dims.map(_._2))
    dims.zipWithIndex.flatMap { case ((q, _), d) =>
      pos(d).zipWithIndex.map { case (p, i) =>
        shiftleft(shiftright(q, i).bitwiseAND(1L), p)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** [[zValueN]] as SQL text (for the DuckDB oracle twin) over
    * pre-quantized expressions. */
  def zValueNSql(dims: Seq[(String, Int)]): String = {
    require(dims.nonEmpty && dims.map(_._2).sum <= 63)
    val pos = positions(dims.map(_._2))
    dims.zipWithIndex.flatMap { case ((q, _), d) =>
      pos(d).zipWithIndex.map { case (p, i) => s"((($q >> $i) & 1) << $p)" }
    }.mkString("(", " | ", ")")
  }

  /** Two-dim special case (bit i of x at 2i, of y at 2i+1) — the
    * round-robin layout of [[zValueN]] with equal budgets, kept as
    * the q142 entry point. */
  def zValue(xq: Column, yq: Column, bits: Int = 16): Column =
    zValueN(Seq(xq -> bits, yq -> bits))

  /** The same interleave as SQL text (for the DuckDB oracle twin) over
    * pre-quantized expressions `xq`, `yq`. */
  def zValueSql(xq: String, yq: String, bits: Int = 16): String =
    zValueNSql(Seq(xq -> bits, yq -> bits))
}
