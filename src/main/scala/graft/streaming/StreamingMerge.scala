package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous CDC upsert — the streaming form of [[graft.ext.Merge]]'s
  * batch latest-wins: a current-state table (one row per key, the
  * newest VERSION of that key ever seen) maintained across micro-
  * batches. The ingest half of every mutable-entity pipeline: user
  * profiles, crawl frontier states, document revisions.
  *
  * Latest-wins is defined by `orderCols` — the winner per key is the
  * row with the MAX (orderCols…) struct, compared lexicographically —
  * and deliberately NOT by arrival: a late-arriving batch carrying an
  * older version must lose to state, which makes the final table a
  * pure function of the union of all rows, independent of how the
  * stream was batched (spec-asserted under randomized splits). Callers
  * make (orderCols) unique per key (append a unique id as the last
  * column) or ties resolve arbitrarily.
  *
  * Scale shape — the part that matters at 100 TB of state: the state
  * table is hash-partitioned into `numBuckets` key buckets, and a
  * micro-batch REWRITES ONLY THE BUCKETS ITS KEYS TOUCH (untouched
  * buckets are never read or written). Per batch: one argmax aggregate
  * over the batch, a partition-pruned read of the touched buckets, one
  * merge aggregate bounded by |touched state| + |batch|, one
  * bucket-targeted write. A batch touching k buckets costs
  * O(state/numBuckets · k), not O(state).
  *
  * Commit protocol — state is NEVER mutated in place. Each update
  * writes its merged buckets to a FRESH generation directory
  * (`gen-<v>/__bucket=<b>/…`) and then atomically publishes a manifest
  * (`manifest/v…txt`, one `bucket gen` line per bucket) via
  * write-temp-then-rename; readers resolve the highest manifest
  * version and read exactly the per-bucket generation dirs it names.
  * A failure at ANY point leaves the previous manifest — and every
  * generation it references — fully intact, so a replayed batch merges
  * against consistent state and concurrent [[StateStore.current]]
  * readers never observe a half-written or deleted bucket. The merge
  * itself is associative/idempotent (max), so a replayed batch
  * publishes a new generation with IDENTICAL rows. Superseded
  * generations accumulate until an explicit [[StateStore.vacuum]] —
  * retention is a policy decision (readers may hold older snapshots),
  * not something an ingest path should decide implicitly.
  */
object StreamingMerge {

  /** Driver-held handle on the bucketed current-state table. */
  final class StateStore(spark: SparkSession, storePath: String,
                         keyCol: String, orderCols: Seq[String],
                         numBuckets: Int = 32) {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    private val manifestDir = s"$storePath/manifest"
    private def genPath(g: Long): String = s"$storePath/gen-$g"
    private def fs = new Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def withBucket(df: DataFrame): DataFrame =
      df.withColumn("__bucket",
        pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int"))

    /** max-by-(orderCols) row per key; input must carry __bucket. */
    private def latestPerKey(df: DataFrame): DataFrame = {
      val payload = df.columns.filter(_ != keyCol)
      df.groupBy(col(keyCol))
        .agg(max_by(struct(payload.map(col).toIndexedSeq: _*),
          struct(orderCols.map(col): _*)).as("__w"))
        .select(col(keyCol) +: payload.map(c => col(s"__w.$c").as(c)): _*)
    }

    /** Highest published manifest: (version, bucket → generation). */
    private def latestManifest(): Option[(Long, Map[Int, Long])] = {
      val dir = new Path(manifestDir)
      if (!fs.exists(dir)) return None
      val vs = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.matches("v\\d+\\.txt"))
        .map(_.stripPrefix("v").stripSuffix(".txt").toLong)
      if (vs.isEmpty) return None
      val v = vs.max
      val in = fs.open(new Path(dir, f"v$v%012d.txt"))
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val mapping = txt.split("\n").iterator.filter(_.nonEmpty).map { l =>
        val parts = l.split(" ")
        parts(0).toInt -> parts(1).toLong
      }.toMap
      Some((v, mapping))
    }

    /** Atomic publish: temp write + rename. A lost rename race (another
      * publisher of the same deterministic content) is benign.
      */
    private def publishManifest(v: Long, mapping: Map[Int, Long]): Unit = {
      fs.mkdirs(new Path(manifestDir))
      val target = new Path(manifestDir, f"v$v%012d.txt")
      val content = mapping.toSeq.sorted
        .map { case (b, g) => s"$b $g" }.mkString("\n")
      val tmp = new Path(manifestDir, f".v$v%012d.txt.tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, target)) fs.delete(tmp, false)
    }

    /** Read the named buckets from their generation dirs, `__bucket`
      * reattached via partition discovery (basePath per generation).
      * One relation per distinct generation, not per bucket.
      */
    private def readBuckets(mapping: Map[Int, Long]): DataFrame = {
      val frames = mapping.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (g, bs) =>
          spark.read.option("basePath", genPath(g))
            .parquet(bs.keys.toSeq.sorted
              .map(b => s"${genPath(g)}/__bucket=$b"): _*)
        }
      frames.reduce(_.unionByName(_))
    }

    /** Merge one batch into the state (latest-wins). */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      val clean = batch.filter(col(keyCol).isNotNull &&
        orderCols.map(col(_).isNotNull).reduce(_ && _))
      // pin the batch argmax ONCE: the touched-bucket collect and the
      // merge write both consume it, and without the checkpoint each
      // action re-ran the whole batch aggregate from the source scan
      // (actions don't share exchanges — measured as the double batch
      // scan in the q194 profile)
      val best = latestPerKey(withBucket(clean)).localCheckpoint()
      // emptiness falls out of the touched-bucket collect below — a
      // separate isEmpty() pre-check was one more action recomputing
      // the whole batch aggregate
      val touched = best.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSet // bounded by numBuckets
      if (touched.isEmpty) return
      val (prevV, mapping) = latestManifest().getOrElse((0L, Map.empty[Int, Long]))
      val v = prevV + 1
      val existingTouched = mapping.filter { case (b, _) => touched.contains(b) }
      val merged = if (existingTouched.nonEmpty) {
        val existing = readBuckets(existingTouched)
          .select(best.columns.map(col).toIndexedSeq: _*)
        latestPerKey(existing.unionByName(best))
      } else best
      merged
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(genPath(v))
      publishManifest(v, mapping ++ touched.map(_ -> v))
    }

    /** The current-state table (without the bucket column) — a
      * consistent snapshot: the plan pins the generation dirs the
      * latest manifest names, which no later update ever rewrites.
      */
    def current(): DataFrame = {
      val (_, mapping) = latestManifest().getOrElse(
        throw new IllegalArgumentException(
          s"state store at $storePath has no batches yet"))
      readBuckets(mapping).drop("__bucket")
    }

    /** Delete generation dirs and manifests superseded by the latest
      * manifest. Callers run this only when no reader still holds a
      * snapshot older than the latest manifest — update() itself never
      * deletes anything.
      */
    def vacuum(): Unit = synchronized {
      latestManifest().foreach { case (v, mapping) =>
        val live = mapping.values.toSet
        fs.listStatus(new Path(storePath)).foreach { st =>
          val n = st.getPath.getName
          if (n.matches("gen-\\d+") &&
              !live.contains(n.stripPrefix("gen-").toLong))
            fs.delete(st.getPath, true)
        }
        fs.listStatus(new Path(manifestDir)).foreach { st =>
          val n = st.getPath.getName
          if (n.matches("v\\d+\\.txt") &&
              n.stripPrefix("v").stripSuffix(".txt").toLong < v)
            fs.delete(st.getPath, false)
        }
      }
    }

    /** foreachBatch adapter. */
    def asForeachBatch: (DataFrame, Long) => Unit =
      (df, id) => update(df, id)
  }

  /** Streaming entry: maintain the state table from a stream. */
  def start(stream: DataFrame, storePath: String, keyCol: String,
            orderCols: Seq[String], numBuckets: Int = 32): StreamingQuery = {
    val store = new StateStore(stream.sparkSession, storePath, keyCol,
      orderCols, numBuckets)
    stream.writeStream
      .outputMode("update")
      .foreachBatch(store.asForeachBatch)
      .start()
  }

  /** Deterministic batch-replay (the gate harness): fold the batches in
    * order, return the final current state.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, keyCol: String,
              orderCols: Seq[String], numBuckets: Int = 32): DataFrame = {
    val store = new StateStore(spark, storePath, keyCol, orderCols, numBuckets)
    batches.zipWithIndex.foreach { case (b, i) => store.update(b, i.toLong) }
    store.current()
  }
}
