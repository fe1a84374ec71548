package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** LSM-shaped accumulating keyed parquet store shared by the
  * continuous-dedup operators ([[StreamingSpanDedup]]'s gram store,
  * [[StreamingParagraphDedup]]'s paragraph store,
  * [[StreamingBoilerplate]]'s counting line store): per-batch delta
  * directories fold periodically into ONE bucketed-by-key compacted
  * base registered in the catalog, so a per-batch probe join NEVER
  * shuffles the base — only the (tiny) batch keys move to meet it —
  * and repeated content folds at compaction, it never accumulates rows.
  * Merge modes: DISTINCT keys (default); with `countCol` set, a BIGINT
  * payload sum-merged per key (cumulative frequency stores); with
  * `extraCols` set, DISTINCT whole rows of (key, extras) — posting
  * stores like [[StreamingMinhashLsh]]'s (band key → doc id) index,
  * still bucketed by `keyCol` so probe joins never shuffle the base.
  *
  * Layout under `storePath`:
  *  - `compacted_upto_<n>/`: the distinct keys of all batches < n, ONE
  *    bucketed table (restart-stable: the DDL re-registers the bucket
  *    spec from `numBuckets`, which therefore must not change across
  *    restarts of the same store).
  *  - `batch=<id>/`: not-yet-compacted per-batch deltas (at most
  *    `compactEvery`; small — the probe's planner broadcasts them).
  *
  * Retry-idempotence: batch appends overwrite their own `batch=<id>`
  * directory; compaction writes a new version named by the batch id and
  * cleans up only AFTER the new version commits, so a crash
  * mid-compaction leaves a readable store.
  */
final class KeyedBatchStore(spark: SparkSession, storePath: String,
                            keyCol: String, keySqlType: String,
                            compactEvery: Int, numBuckets: Int,
                            countCol: Option[String] = None,
                            retainAtCompact: Option[
                              Long => org.apache.spark.sql.Column] = None,
                            extraCols: Seq[(String, String)] = Seq.empty) {
  require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
  require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
  require(Set("BIGINT", "STRING").contains(keySqlType),
    s"keySqlType must be BIGINT or STRING, got $keySqlType")
  require(countCol.forall(_ != keyCol), "countCol must differ from keyCol")
  require(countCol.isEmpty || extraCols.isEmpty,
    "countCol (sum-merge per key) and extraCols (distinct rows) are " +
      "mutually exclusive merge modes")
  require(extraCols.forall { case (n, t) =>
    n != keyCol && Set("BIGINT", "STRING", "DOUBLE",
      "ARRAY<BIGINT>", "ARRAY<STRING>").contains(t.toUpperCase) },
    s"extraCols must not collide with keyCol and must use a supported " +
      s"SQL type, got $extraCols")

  private def fs = new Path(storePath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The store's row schema, known from the constructor parameters —
    * passed to every delta read so `spark.read` never runs a
    * footer-inference job over the delta files (one job per probe/fold
    * read otherwise; at scale, a round of object-store footer fetches).
    */
  private val rowSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      (Seq(s"$keyCol $keySqlType") ++
        extraCols.map { case (n, t) => s"$n $t" } ++
        countCol.map(c => s"$c BIGINT")).mkString(", "))

  private def readDeltas(files: Seq[String]): DataFrame =
    spark.read.schema(rowSchema).parquet(files: _*)

  /** Catalog identity of a compacted version: derived from the store
    * PATH (two stores on one path share tables; different paths — e.g.
    * parallel test suites — never collide).
    */
  private val tablePrefix = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(storePath.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"graft_key_store_$digest"
  }
  private def tableName(upTo: Long) = s"${tablePrefix}_upto_$upTo"
  private def compactedDir(upTo: Long) = s"$storePath/compacted_upto_$upTo"

  /** Compacted versions ON DISK (the source of truth — the catalog is
    * session-scoped and empty after a restart), newest first.
    */
  private def compactedVersions(): Seq[Long] = {
    val dir = new Path(storePath)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("compacted_upto_"))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("compacted_upto_").toLong).toOption)
      .sorted(Ordering[Long].reverse)
  }

  /** The newest compacted base covering only batches strictly below
    * `batchId`, (re-)registered in the catalog so its scan reports the
    * bucket partitioning.
    */
  private def baseFor(batchId: Long): Option[(Long, DataFrame)] =
    compactedVersions().find(_ <= batchId).map { upTo =>
      val name = tableName(upTo)
      if (!spark.catalog.tableExists(name)) {
        val cols = (Seq(s"$keyCol $keySqlType") ++
          extraCols.map { case (n, t) => s"$n $t" } ++
          countCol.map(c => s"$c BIGINT")).mkString(", ")
        spark.sql(
          s"""CREATE TABLE IF NOT EXISTS $name ($cols)
             |USING parquet
             |CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $numBuckets BUCKETS
             |LOCATION '${compactedDir(upTo)}'""".stripMargin)
      }
      upTo -> spark.table(name)
    }

  /** Parquet files of delta batches with id in [from, until). */
  private def deltaFiles(from: Long, until: Long): Seq[String] = {
    val dir = new Path(storePath)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter { s =>
        val name = s.getPath.getName
        s.isDirectory && name.startsWith("batch=") &&
          scala.util.Try(name.stripPrefix("batch=").toLong).toOption
            .exists(id => id >= from && id < until)
      }
      .flatMap(d => fs.listStatus(d.getPath).toSeq)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
  }

  /** Fold deltas [c, batchId) into a new compacted version when due.
    * Idempotent under foreachBatch retry; cleanup runs only after the
    * new version commits.
    */
  def maybeCompact(batchId: Long): Unit = {
    val base = baseFor(batchId)
    val c = base.map(_._1).getOrElse(0L)
    if (batchId - c < compactEvery) return
    val deltas = deltaFiles(c, batchId)
    val parts = base.map(_._2).toSeq ++
      (if (deltas.isEmpty) Seq.empty else Seq(readDeltas(deltas)))
    if (parts.isEmpty) return
    // distinct mode collapses duplicate rows (whole-row with
    // extraCols); counting mode sum-merges
    // per-batch counts into one row per key (same sub-linear-growth
    // property: repeated content folds, it never accumulates rows)
    val folded = countCol match {
      case None => parts.reduce(_ unionByName _).distinct()
      case Some(c) => parts.reduce(_ unionByName _)
        .groupBy(org.apache.spark.sql.functions.col(keyCol))
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col(c)).as(c))
    }
    // retention hook (batch-tagged stores): rows failing the caller's
    // keep-predicate for this compaction frontier are dropped HERE —
    // the fold is the only moment the base is rewritten anyway, so
    // expiry is free, and state stops growing with stream lifetime
    val retained = retainAtCompact match {
      case Some(keep) => folded.filter(keep(batchId))
      case None => folded
    }
    retained
      .write.mode("overwrite")
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
      .option("path", compactedDir(batchId))
      .format("parquet")
      .saveAsTable(tableName(batchId))
    (c until batchId).foreach { id =>
      fs.delete(new Path(s"$storePath/batch=$id"), true)
    }
    compactedVersions().filter(_ < batchId).foreach { old =>
      spark.sql(s"DROP TABLE IF EXISTS ${tableName(old)}")
      fs.delete(new Path(compactedDir(old)), true)
    }
  }

  /** The strictly-prior store as probe PARTS (compacted base first, then
    * the delta slice) — also the audit surface for store-size
    * assertions.
    */
  def parts(batchId: Long): Seq[DataFrame] = {
    val base = baseFor(batchId)
    val from = base.map(_._1).getOrElse(0L)
    val files = deltaFiles(from, batchId)
    base.map(_._2).toSeq ++
      (if (files.isEmpty) Seq.empty else Seq(readDeltas(files)))
  }

  /** Write a batch's frame under its own `batch=<id>` directory
    * (overwrite → retry-idempotent). The frame must have exactly the
    * store's columns in store order: key, extras, count — matching the
    * registered DDL of the compacted base it will fold into.
    */
  def append(keys: DataFrame, batchId: Long): Unit =
    keys.write.mode("overwrite").parquet(s"$storePath/batch=$batchId")

  /** The newest compacted frontier (batches < this id are folded into
    * the base), or None when nothing has compacted yet. Retention
    * horizons derive from THIS (not from the append frontier): rows
    * are only ever evicted at a fold, so everything at or above
    * `latestCompactedUpTo - retention` is still fully readable.
    */
  def latestCompactedUpTo(): Option[Long] = compactedVersions().headOption

  /** Highest batch id with state on disk (delta dirs, plus
    * `compacted_upto_U` covering batches up to U−1), or None for a
    * fresh store. Pure filesystem listing — no data read.
    */
  def maxStoredBatchId(): Option[Long] = {
    val dir = new Path(storePath)
    val deltas =
      if (!fs.exists(dir)) Seq.empty[Long]
      else fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.stripPrefix("batch=").toLong).toOption)
    val covered = compactedVersions().map(_ - 1L)
    (deltas ++ covered).reduceOption(_ max _)
  }

  /** Fail fast on batch-id REGRESSION (the [[maxStoredBatchId]] check
    * accumulator `update`s run before appending): a stream restarted
    * WITHOUT its checkpoint re-numbers batches from 0, and because the
    * batch id is folded into stored keys, the restarted stream's cells
    * would silently interleave under old ids — corrupting any
    * `[fromBatch, uptoBatch)` windowed read (a cumulative read stays a
    * harmless union). A RETRY of the latest batch (same id) is allowed:
    * `append` overwrites its own directory idempotently.
    */
  def requireNoRegression(batchId: Long): Unit =
    maxStoredBatchId().filter(_ > batchId).foreach { m =>
      throw new IllegalArgumentException(
        s"store $storePath already holds batches up to $m but batch " +
          s"$batchId arrived — a restarted stream must reuse its " +
          "checkpointLocation, and a new query needs a fresh storePath")
    }
}
