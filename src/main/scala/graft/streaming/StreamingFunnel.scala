package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-step funnel — the continuous twin of `ext.Funnel`:
  * per entity, the earliest strictly-increasing chain of timestamps
  * through the step sequence, maintained incrementally as events arrive.
  *
  * State is CONSTANT per entity: the timestamps of the stages achieved so
  * far (≤ k values), nothing else — no event history. That bound is what
  * makes the operator viable on an unbounded stream, and it is paid for
  * with an ordering contract: events are folded in event-time order
  * WITHIN each micro-batch, and stage times are immutable once set, so a
  * cross-batch straggler older than an already-committed stage time
  * cannot retroactively lower it (the exact batch recurrence would).
  * Within one batch — and therefore in the batch replay, where ALL events
  * are one batch — the fold equals `ext.Funnel.funnel` exactly: the
  * forward scan's first step-j event strictly after t_{j-1} IS
  * min{ts > t_{j-1}} (q84 gates this equality against the q71 oracle).
  *
  * flatMap (not map) so an entity emits nothing until it completes
  * step 1, matching the batch funnel's output contract; each batch emits
  * the CURRENT chain per touched entity (Update mode — downstream keeps
  * the latest row per entity).
  */
object StreamingFunnel {

  final case class FunnelEvent(entity: Long, ts: Timestamp, step: String)
  final case class FunnelProgress(entity: Long, times: Seq[Timestamp], depth: Int)

  /** Fold a batch of events (sorted by event time; ties in input order)
    * into the achieved-stage chain.
    */
  private def advance(steps: Seq[String], achieved: Seq[Timestamp],
                      events: Iterator[FunnelEvent]): Seq[Timestamp] = {
    // (millis, nanos) is the Timestamp total order; stable sort keeps
    // input order on exact ties
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos))
    sorted.foldLeft(achieved) { (acc, e) =>
      val next = acc.length // index of the stage this entity still needs
      if (next < steps.length && e.step == steps(next) &&
        (next == 0 || e.ts.compareTo(acc.last) > 0)) acc :+ e.ts
      else acc
    }
  }

  /** The stateful core, usable in BOTH modes: on a stream it maintains
    * per-entity state across micro-batches; on a static Dataset (batch
    * replay) state starts empty and the single invocation computes the
    * full funnel.
    */
  def progress(events: Dataset[FunnelEvent],
               steps: Seq[String]): Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.entity)
      .flatMapGroupsWithState[Seq[Timestamp], FunnelProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (entity, batch, state: GroupState[Seq[Timestamp]]) =>
          val merged = advance(steps, state.getOption.getOrElse(Seq.empty), batch)
          state.update(merged)
          if (merged.isEmpty) Iterator.empty
          else Iterator(FunnelProgress(entity, merged, merged.length))
      }
  }

  /** Batch replay with the q71-shaped output: one row per entity that
    * completed step 1, columns (entityCol, t_1..t_k, depth) — provably
    * equal to `ext.Funnel.funnel` on the same frame (see scaladoc).
    * Contract: `entityCol` must be numeric (the state key is a long; a
    * non-numeric id fails the ANSI cast loudly — hash string entities to
    * a surrogate first, the connectedComponents stance).
    */
  def batchFunnel(events: DataFrame, entityCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.select(
      col(entityCol).cast("long").as("entity"),
      col(tsCol).cast("timestamp").as("ts"),
      col(typeCol).cast("string").as("step")).as[FunnelEvent]
    // try_element_at: a broken chain leaves later stages null (ANSI
    // element_at would throw past the end of the achieved-stage array)
    val stageCols = steps.indices.map(i =>
      try_element_at(col("times"), lit(i + 1)).as(s"t_${i + 1}"))
    progress(ds, steps).toDF()
      .select(col("entity").as(entityCol) +: stageCols :+
        col("depth").cast("long").as("depth"): _*)
  }
}
