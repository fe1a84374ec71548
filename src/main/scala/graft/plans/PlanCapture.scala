package graft.plans

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Lineage cut (lazy `localCheckpoint`) with a test-visible plan tap.
  *
  * Operators that iterate (connected components) or fan one expensive
  * frame into several consumers (bm25, cooccurrence, containment,
  * incremental dedup, curation) truncate their lineage with lazy local
  * checkpoints. That truncation also blinds plan-level guards: the
  * physical plan of the FINAL frame no longer contains the upstream
  * stages, so a cartesian product hiding before the cut would never be
  * seen by a plan assertion on the result (the round-3 PlanGuardSpec
  * blind spot).
  *
  * `cut` is therefore the single checkpoint chokepoint for all main-code
  * operators: it records the pre-cut physical plan into a thread-local tap
  * when one is installed (tests only — `capturing`), then checkpoints.
  * Production cost of the tap check is one thread-local read per cut;
  * the `sparkPlan` it records is forced by `localCheckpoint` anyway.
  */
object PlanCapture {

  private val tap = new ThreadLocal[ListBuffer[SparkPlan]]()

  /** Lazy local checkpoint of `df`, recording the pre-cut physical plan in
    * the calling thread's tap when one is installed. Thread-local by
    * design: query construction happens on the caller's thread, and suites
    * running concurrently in the same JVM must not see each other's plans.
    */
  def cut(df: DataFrame): DataFrame = {
    val buf = tap.get()
    if (buf != null) buf += df.queryExecution.sparkPlan
    // stats reset: localCheckpoint preserves the child's ESTIMATED
    // statistics through the cut, so iterative self-joining operators
    // square their sizeInBytes estimate every round until the size-only
    // stats visitor grinds on million-digit BigIntegers (digit count
    // measurably doubles per round). The shim rewraps the SAME
    // checkpointed RDD — partitioning and ordering preserved — minus
    // the inherited estimate; AQE's runtime sizes still drive joins.
    org.apache.spark.sql.GraftStatsReset.freshStats(df.localCheckpoint(false))
  }

  /** Materialize `df` (typically a fresh [[cut]]) and return its row
    * count plus the EXACT integer sums of the named integral columns —
    * in ONE plain RDD job over the physical rows, not a SQL action.
    *
    * Why this exists (r16, optimization-guide §1/§2): iterative
    * operators need a per-round convergence scalar, and a
    * `df.agg(sum(...)).head()` is a whole extra SQL execution per round
    * — planned, adaptively executed, and billed ~tens of ms of fixed
    * driver cost at any data size. The checkpointed frame has to be
    * materialized by SOME action anyway before the next round builds on
    * it; this folds the scalar read into that action. BigInt
    * accumulation is exact for any width (the decimal(38,0) wrap
    * argument in [[graft.ext.Dedup.connectedComponents]] holds a
    * fortiori), and nulls are skipped exactly like SQL `sum`.
    */
  def materializeSums(df: DataFrame, cols: Seq[String]): (Long, Seq[BigInt]) = {
    import org.apache.spark.sql.types._
    val schema = df.schema
    val specs: Array[(Int, org.apache.spark.sql.types.DataType)] =
      cols.map { c =>
        val i = schema.fieldIndex(c)
        (i, schema(i).dataType)
      }.toArray
    specs.foreach { case (i, dt) =>
      require(dt match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0
        case _ => false
      }, s"materializeSums needs integral columns; '${schema(i).name}' is $dt")
    }
    val partials = df.queryExecution.toRdd.mapPartitions { it =>
      var cnt = 0L
      val acc = Array.fill(specs.length)(BigInt(0))
      while (it.hasNext) {
        val r = it.next()
        cnt += 1L
        var j = 0
        while (j < specs.length) {
          val (i, dt) = specs(j)
          if (!r.isNullAt(i)) acc(j) += (dt match {
            case LongType => BigInt(r.getLong(i))
            case IntegerType => BigInt(r.getInt(i))
            case ShortType => BigInt(r.getShort(i).toLong)
            case ByteType => BigInt(r.getByte(i).toLong)
            case d: DecimalType =>
              BigInt(r.getDecimal(i, d.precision, d.scale)
                .toJavaBigDecimal.toBigIntegerExact)
          })
          j += 1
        }
      }
      Iterator.single((cnt, acc))
    }.collect()
    val n = partials.map(_._1).sum
    val sums = cols.indices.map(j => partials.map(_._2(j)).sum)
    (n, sums)
  }

  /** Run `body` with a plan tap installed on this thread; returns its
    * result plus every pre-cut physical plan recorded during the run —
    * the stages a plan assertion on the final frame cannot see.
    */
  def capturing[A](body: => A): (A, Seq[SparkPlan]) = {
    val prev = tap.get()
    val buf = ListBuffer.empty[SparkPlan]
    tap.set(buf)
    try {
      val r = body
      (r, buf.toList)
    } finally {
      if (prev == null) tap.remove() else tap.set(prev)
    }
  }
}
