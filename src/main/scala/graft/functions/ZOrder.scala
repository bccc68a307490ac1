package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding for multi-dimensional data
  * clustering — the layout tool behind Delta/Iceberg `OPTIMIZE ZORDER`:
  * sort/range-partition files by the interleaved bits of several
  * columns so per-file min/max stats stay narrow on EVERY interleaved
  * dimension, and box predicates prune files instead of scanning the
  * whole table. At 100 TB the layout is the difference between a
  * selective two-column query reading a handful of files and reading
  * the full table: a single-column sort gives perfect pruning on one
  * dimension and none on the other; the Z-curve splits the benefit.
  *
  * Everything here is Long bit-arithmetic (shift/and/or via the classic
  * magic-mask spread), codegen-friendly and bit-identical across
  * engines — the DuckDB oracle replays the same masks.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2*i
    * (0 <= result < 2^31). */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton-interleave two 16-bit values: a's bits at even positions,
    * b's at odd — the 32-bit Z-address of the cell (a, b). */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Scale `v` in [minV, maxV] to the 16-bit grid, integer-exactly:
    * ((v - min) * 65535) div max(1, max - min). Inputs outside the range
    * clamp to the grid edges (stats drift between layout time and the
    * data actually written must not corrupt the curve). */
  def grid16(v: Column, minV: Column, maxV: Column): Column = {
    val clamped = least(greatest(v, minV), maxV)
    expr_div((clamped - minV) * 65535L, greatest(maxV - minV, lit(1L)))
  }

  /** Z-address of (a, b) given their value ranges — the column to range
    * partition / sort by when clustering a write. */
  def zAddress(a: Column, minA: Column, maxA: Column,
               b: Column, minB: Column, maxB: Column): Column =
    interleave16(grid16(a, minA, maxA), grid16(b, minB, maxB))

  /** Integral division that stays in Long (no double round-trip — a
    * double division corrupts quotients past 2^53). */
  private def expr_div(num: Column, den: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide}
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(num), ColumnBridge.expression(den), EvalMode.LEGACY))
  }
}
