package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition key for windows over frames that are BOUNDED BY
  * CONSTRUCTION (coarse bucket carries, vocabularies, per-domain budget
  * frames): every row maps to the single partition a bounded frame
  * should run in, while the window still carries a NON-EMPTY partition
  * spec — so the intent is stated in the plan, `WindowExec` does not
  * warn, and the PlanGuard rule "no empty partition spec anywhere on
  * the gate surface" keeps meaning something.
  *
  * A bare `lit(0)` does not work: Catalyst constant-folds foldable
  * partition expressions OUT of the window spec, which lands right back
  * at the unpartitioned plan. `pmod(xxhash64(anchor), 1)` is the same
  * constant zero for every row (xxhash64 never returns null), but
  * depends on a column, so the optimizer must keep it.
  */
object SingleTask {

  /** Constant-zero, optimizer-stable partition key derived from any
    * column of the frame. Only use over frames with a stated bound —
    * this is a declaration, not a fix, and the declaration is ENFORCED:
    * `SingleTaskRegistrySpec` fails the suite on any call site not
    * registered there with a framed-cardinality assertion.
    */
  def key(anchor: Column): Column = pmod(xxhash64(anchor), lit(1L))
}
