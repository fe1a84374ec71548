package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codegen'd rank lookups over SORTED integer literal arrays — the
  * shared primitive of every inlined-threshold sampler/router in the
  * module ([[Privacy.discreteLaplaceNoise]], [[Bootstrap]],
  * [[Ring.consistentShard]]).
  *
  * The obvious `size(filter(typedlit(arr), t => t <= h))` walks the
  * array through the INTERPRETED higher-order-function path: one boxed
  * lambda call per element per row — measured 2 ms/row on a 512-point
  * ring (338 s for an sf0.1 gate that should cost one scan). A
  * binary-search WHEN-tree makes the same lookup ⌈log2 n⌉ codegen'd
  * long comparisons with zero allocation: the tree is built once at
  * plan time from the literal values, so Tungsten sees only nested
  * CASE WHEN on a long column.
  */
object IntLadder {

  /** Number of entries `t` in the sorted array with `t <= h` (or
    * `t < h` when `strict`) — the [[graft.functions.SortedRankBelow]]
    * native expression: one generated call into a static binary-search
    * kernel. Both pure-Column formulations fail at ladder scale: the
    * HOF `size(filter(...))` is interpreted per element (boxed lambda
    * calls — measured 2 ms/row at 512 points), and a when-ladder
    * overflows Janino's 64 KB method limit inside larger projections
    * and drops the whole stage to interpreted eval.
    */
  def countBelow(sorted: Array[Long], h: Column,
                 strict: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SortedRankBelow(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          h.cast("long")),
        sorted, strict))
}
