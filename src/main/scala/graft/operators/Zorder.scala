package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) space-filling-curve clustering: interleave the
  * bits of two bucketed dimensions so that sorting by the single
  * `z` value co-locates rows that are close in BOTH dimensions.
  * This is the standard multi-dimensional data-skipping layout
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`): with files/row-groups cut
  * along z-runs, a 2-D predicate rectangle touches only the few
  * aligned curve tiles that intersect it, and every other file is
  * pruned by its min/max footer stats — whereas a layout sorted by
  * one dimension alone must scan every file for a predicate on the
  * other.
  *
  * Built from codegen'd built-ins only (`shiftright`/`shiftleft`/
  * bitwise and/or) — no UDF, stays inside WholeStageCodegen, and the
  * identical integer arithmetic is expressible in any ANSI engine
  * (the x16 oracle spells it in DuckDB).
  *
  * Scale notes (100 TB): the z value is a pure row-local expression —
  * computing it is free at scan time; the clustering write is one
  * `repartitionByRange(z)` + `sortWithinPartitions(z)` (a single
  * range shuffle, the same cost as any global sort) and pays for
  * itself on every subsequent 2-D-selective read. Block stats
  * (min/max per z-block) are one hash aggregate.
  */
object Zorder {

  /** 16-bit Morton code: interleaves the low 8 bits of `bx` (odd bit
    * positions) and `by` (even positions). Inputs must already be
    * bucketed to 0..255 — [[bucket256]] is the scaling helper.
    */
  def interleave16(bx: Column, by: Column): Column =
    (0 until 8).flatMap { i =>
      Seq(shiftleft(shiftright(bx, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(by, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _).cast("long")

  /** Scale a non-negative value with known inclusive range size
    * `span` (= max − min + 1 after the caller's own `v − min` shift)
    * into buckets 0..255: `floor(v · 256 / span)`. Double-floor
    * arithmetic, exact for v < 2^45 — identical in DuckDB as
    * `CAST(FLOOR(v * 256.0 / span) AS BIGINT)`.
    */
  def bucket256(v: Column, span: Column): Column =
    floor(v.cast("double") * 256.0 / span.cast("double")).cast("long")
}
