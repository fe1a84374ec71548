package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Similarity

/** Continuously-maintained IVF index — the streaming form of
  * [[graft.ext.Similarity.ivfAssign]]'s frozen-quantizer append (and
  * the similarity family's member of the streaming-accumulator suite:
  * StreamingHll / StreamingHdr / StreamingTDigest): each micro-batch of
  * vectors is assigned to its Voronoi cell by one kernel scan and
  * written as its own postings delta; search probes the union of all
  * deltas so far. Nothing ever rebuilds, existing postings never move,
  * and because assignment is a pure per-row function of the FROZEN
  * centroids, the accumulated index equals the bulk index of the
  * concatenated batches byte for byte — which is exactly what lets the
  * DuckDB oracle replay every per-batch search state.
  *
  * Layout under `storePath`:
  *  - `centroids/`: the frozen coarse quantizer, written ONCE at
  *    construction (one tiny parquet of ≤ numCells rows) and RELOADED
  *    by any later accumulator attaching to the same store — restart
  *    recovery cannot silently re-sample a different quantizer.
  *  - `batch=<id>/`: per-batch postings deltas `(cell, neighbor_id,
  *    vec, vnorm)`. A retried batch overwrites its own directory with
  *    identical bytes (assignment is deterministic).
  *
  * Drift watch: [[cellStats]] exposes the per-cell occupancy and the
  * hottest-cell imbalance over everything ingested so far — when the
  * stream drifts away from the frozen centroids this climbs, and past
  * a policy threshold the index earns a rebuild (re-sample centroids
  * from recent data into a NEW storePath, re-point readers).
  */
object StreamingIvf {

  final class IvfAccumulator(spark: SparkSession, storePath: String,
                             idCol: String, vecCol: String,
                             centroidsIn: Seq[(Long, Seq[Double])],
                             vecSqlType: String = "ARRAY<FLOAT>") {

    private def fs = new Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def batchDir(id: Long) = s"$storePath/batch=$id"
    private val centroidsDir = s"$storePath/centroids"

    /** The frozen quantizer: persisted on first construction, reloaded
      * (and REQUIRED over `centroidsIn`) on every later attach.
      */
    val centroids: Seq[(Long, Seq[Double])] = {
      if (!fs.exists(new Path(centroidsDir))) {
        require(centroidsIn.nonEmpty,
          s"no centroids given and none stored at $centroidsDir — build " +
            "them once with Similarity.ivfCentroids(initialCorpus, ...)")
        import spark.implicits._
        centroidsIn.toDF("centroid_id", "cvec")
          .coalesce(1).write.mode("overwrite").parquet(centroidsDir)
        centroidsIn
      } else {
        val stored = spark.read.parquet(centroidsDir)
          .select(col("centroid_id"), col("cvec"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
          .sortBy(_._1).toSeq
        require(centroidsIn.isEmpty || centroidsIn.sortBy(_._1) == stored,
          s"store $storePath already holds a different frozen quantizer " +
            "— postings assigned under it would be inconsistent with the " +
            "new centroids; use a fresh storePath to re-quantize")
        stored
      }
    }

    private def batchIds(): Seq[Long] = {
      val dir = new Path(storePath)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.stripPrefix("batch=").toLong).toOption)
        .sorted
    }

    /** Append one micro-batch: one kernel-assignment scan of the batch,
      * one delta write. Fails fast on batch-id REGRESSION (ids above
      * this one already on disk): a stream restarted without its
      * checkpoint re-numbers from 0 and would silently interleave a new
      * stream's postings under an old stream's ids.
      */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      val stale = batchIds().filter(_ > batchId)
      require(stale.isEmpty,
        s"postings store $storePath already holds batches up to " +
          s"${stale.max} but batch $batchId arrived — a restarted stream " +
          "must reuse its checkpointLocation, and a new query needs a " +
          "fresh storePath")
      Similarity.ivfAssign(batch, idCol, vecCol, centroids)
        .write.mode("overwrite").parquet(batchDir(batchId))
    }

    /** The postings ingested by batches < `uptoBatch` (all, by
      * default). LAZY parquet reads — union of the per-batch deltas.
      * The pre-first-batch empty frame types `vec` from the
      * construction-time `vecSqlType` (not a hardcoded ARRAY<FLOAT>):
      * an index over array<double> vectors must present the SAME
      * schema before and after its first delta lands.
      */
    def postings(uptoBatch: Long = Long.MaxValue): DataFrame = {
      val ids = batchIds().filter(_ < uptoBatch)
      if (ids.isEmpty)
        spark.sql("SELECT CAST(NULL AS BIGINT) AS cell, " +
          "CAST(NULL AS BIGINT) AS neighbor_id, " +
          s"CAST(NULL AS $vecSqlType) AS vec, " +
          "CAST(NULL AS DOUBLE) AS vnorm WHERE FALSE")
      else ids.map(i => spark.read.parquet(batchDir(i)))
        .reduce(_ unionByName _)
    }

    /** Top-k search over everything ingested so far (or a prefix). */
    def search(queries: DataFrame, queryIdCol: String, k: Int = 10,
               nprobe: Int = 3, uptoBatch: Long = Long.MaxValue): DataFrame =
      Similarity.ivfSearchPostings(postings(uptoBatch), queries,
        queryIdCol, vecCol, centroids, k, nprobe)

    /** Occupancy + imbalance (the rebuild trigger) over the ingested
      * postings — see [[graft.ext.Similarity.ivfCellStats]].
      */
    def cellStats(uptoBatch: Long = Long.MaxValue): DataFrame =
      Similarity.ivfCellStats(postings(uptoBatch), centroids.length)

    /** foreachBatch adapter. */
    def asForeachBatch: (DataFrame, Long) => Unit =
      (batch, id) => update(batch, id)
  }

  /** Attach the accumulator to a vector stream. */
  def start(stream: DataFrame, storePath: String, idCol: String,
            vecCol: String, centroids: Seq[(Long, Seq[Double])],
            queryName: String = "graft-stream-ivf",
            checkpoint: Option[String] = None,
            vecSqlType: String = "ARRAY<FLOAT>")
      : (StreamingQuery, IvfAccumulator) = {
    val acc = new IvfAccumulator(stream.sparkSession, storePath,
      idCol, vecCol, centroids, vecSqlType)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(acc.asForeachBatch)
    checkpoint.foreach(writer.option("checkpointLocation", _))
    (writer.start(), acc)
  }

  /** Batch replay — the oracle-gateable twin: append `batches` in
    * order, reporting the top-k search results after EVERY batch so the
    * gate checks the accumulation at each step.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, idCol: String, vecCol: String,
              centroids: Seq[(Long, Seq[Double])], queries: DataFrame,
              queryIdCol: String, k: Int = 10,
              nprobe: Int = 3): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val acc = new IvfAccumulator(spark, storePath, idCol, vecCol, centroids)
    batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.search(queries, queryIdCol, k, nprobe, uptoBatch = i.toLong + 1)
        .withColumn("batch_id", lit(i.toLong))
        .select("batch_id", "query_id", "neighbor_id", "rank")
    }.reduce(_ unionByName _)
  }
}
