package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Continuous data-QA: the Profile module's column profile, maintained
  * ACROSS micro-batches via `foreachBatch` + a constant-size merged state
  * — the streaming twin of `ext.Profile.columnProfile` the way LogStream's
  * daily counts are the streaming twin of the batch aggregation.
  *
  * Why foreachBatch rather than a streaming aggregation: the profile is a
  * GLOBAL (no grouping key) multi-statistic aggregate whose consumer is a
  * side effect (append to a QA table, compare against the previous
  * dataset version, alert on drift). foreachBatch gives exactly that
  * shape: each micro-batch is folded into a driver-held running state and
  * the CUMULATIVE profile is handed to the sink per batch.
  *
  * Scale stance: per batch, the distributed work is ONE wide aggregate
  * over the batch (partial + final, no shuffle beyond the one-row merge);
  * the cross-batch state is a single collected Row of O(columns) scalars
  * — constant size regardless of stream volume or batch count, and the
  * collect doubles as the lineage cut (the plan does not grow with batch
  * count). Only MERGEABLE statistics are maintained (row/null counts,
  * min/max): exact distinct counts are deliberately absent — they are not
  * mergeable in constant space; run the batch `columnProfileApprox` on
  * the compacted output when cardinalities are needed.
  */
object StreamingProfile {

  /** One-row typed wide aggregate of the mergeable per-column stats. */
  private def wideAgg(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two state rows: counts add, mins min, maxes max — associative
    * and commutative, so batch arrival order cannot change the fixpoint
    * (only which prefix each intermediate render reflects).
    */
  private def merge(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(col(s"__nn_$c")).as(s"__nn_$c"),
        min(col(s"__min_$c")).as(s"__min_$c"),
        max(col(s"__max_$c")).as(s"__max_$c"))
    } :+ sum(col("__n")).as("__n")
    a.unionByName(b).agg(aggs.head, aggs.tail: _*)
  }

  /** Long-form render of a one-row state frame, tagged with the batch id:
    * (batch_id, column, n_rows, n_null, min_value, max_value) — min/max
    * as strings so mixed-type column sets fit one frame, matching the
    * batch profile's contract.
    */
  private def render(state: DataFrame, cols: Seq[String],
                     batchId: Long): DataFrame = {
    val entries = cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__min_$c").cast("string").as("min_value"),
        col(s"__max_$c").cast("string").as("max_value"))
    }
    state.select(explode(array(entries: _*)).as("p"))
      .select(lit(batchId).as("batch_id"), col("p.*"))
  }

  /** Driver-held cumulative profiler. Thread-safe (micro-batches of one
    * query are sequential, but `synchronized` keeps a shared instance safe
    * if a caller wires it into several queries).
    */
  final class CumulativeProfiler(cols: Seq[String]) {
    private var state: Option[(StructType, Row)] = None

    private def stateFrame(df: DataFrame, schema: StructType, row: Row): DataFrame =
      df.sparkSession.createDataFrame(
        java.util.Collections.singletonList(row), schema)

    /** Fold `batch` into the running state; returns the rendered
      * CUMULATIVE long-form profile as of this batch.
      */
    def update(batch: DataFrame, batchId: Long): DataFrame = synchronized {
      val agg = wideAgg(batch, cols)
      val merged = state match {
        case None => agg
        case Some((schema, row)) => merge(stateFrame(batch, schema, row), agg, cols)
      }
      // collect the ONE state row: constant-size cross-batch state, and
      // the lineage cut that keeps the plan from growing with batch count
      val row = merged.head()
      state = Some((merged.schema, row))
      render(stateFrame(batch, merged.schema, row), cols, batchId)
    }

    /** foreachBatch adapter: fold each micro-batch, hand the cumulative
      * profile to `sink` (append to a QA table, alert on drift, ...).
      */
    def asForeachBatch(sink: DataFrame => Unit): (DataFrame, Long) => Unit =
      (batch, id) => sink(update(batch, id))
  }

  /** Attach a cumulative profile to a stream: every micro-batch, `sink`
    * receives the cumulative (batch_id-tagged) profile of everything seen
    * so far.
    */
  def start(stream: DataFrame, cols: Seq[String],
            sink: DataFrame => Unit,
            queryName: String = "graft-stream-profile",
            checkpoint: Option[String] = None): StreamingQuery = {
    val profiler = new CumulativeProfiler(cols)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(profiler.asForeachBatch(sink))
    // production runs pass a checkpoint dir (restart = resume offsets;
    // the driver-held cumulative row restarts empty — document/persist
    // the rendered output if exact continuity across restarts matters);
    // tests fall back to Spark's temp checkpoint
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Batch replay of the cumulative profiler — the oracle-gateable twin:
    * fold `batches` in order through the same merge code and union the
    * per-batch cumulative renders. Equivalent to what a foreachBatch run
    * over the same frames emits, minus the sink.
    */
  def cumulativeByBatch(batches: Seq[DataFrame], cols: Seq[String]): DataFrame = {
    require(batches.nonEmpty, "cumulativeByBatch needs at least one batch")
    val profiler = new CumulativeProfiler(cols)
    batches.zipWithIndex
      .map { case (b, i) => profiler.update(b, i.toLong) }
      .reduce(_.unionByName(_))
  }
}
