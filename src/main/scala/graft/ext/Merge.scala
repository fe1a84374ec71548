package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style merge (upsert) without a table format: the operation that
  * keeps a compacted corpus current as new/changed rows arrive — the
  * incremental counterpart of the reference's "re-run the whole day"
  * idempotency model (`scripts/...:290-302`), for when re-running the
  * day is 100 TB.
  *
  * Scale notes:
  *  - [[upsert]] is one left-anti join on the key. The base side — the big
  *    one — shuffles at most once on the key; when the update batch is
  *    small (the common CDC shape) AQE broadcasts it and the base never
  *    shuffles at all.
  *  - Combined with a `dt=`-partitioned layout, the join only needs the
  *    partitions the batch touches (dynamic partition overwrite on write):
  *    merge cost scales with the CHANGE, not the corpus.
  *  - [[upsertVersioned]] additionally collapses multiple updates per key
  *    (at-least-once delivery) via struct-argmax — deterministic,
  *    max version wins, key order never matters.
  */
object Merge {

  /** Latest-wins upsert: every key present in `updates` takes the update
    * row; all other base rows pass through. Columns are matched by name.
    *
    * Null-key policy (explicit, lazy — no driver-side action): an update
    * row with a NULL in any key identifies nothing — the left-anti join
    * never matches it, so it would be appended on EVERY merge, silently
    * accumulating duplicate null-key rows batch after batch. Such update
    * rows are dropped here. Base null-key rows pass through unchanged:
    * they can never be targeted by a keyed update.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val keyed = updates.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val keep = base.join(keyed.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    keyed.unionByName(keep)
  }

  /** Upsert with in-batch version resolution: if `updates` carries several
    * rows per key, the row with the highest `versionCol` wins (ties broken
    * by the lexicographically greatest remaining struct — deterministic).
    * Then merges over `base` as [[upsert]].
    */
  def upsertVersioned(base: DataFrame, updates: DataFrame,
                      keys: Seq[String], versionCol: String): DataFrame = {
    val payload = updates.columns.filterNot(keys.contains)
    // struct-argmax: one hash aggregate, no window sort
    val latest = updates
      .groupBy(keys.map(col): _*)
      .agg(max(struct((col(versionCol) +: payload.filterNot(_ == versionCol).toSeq.map(col)): _*))
        .as("__m"))
      .select(keys.map(col) ++ payload.toSeq.map(c => col(s"__m.$c").as(c)): _*)
    upsert(base, latest, keys)
  }

  /** Snapshot diff — the audit step between two corpus versions (what a
    * recrawl/reprocess actually changed, before anyone retrains on it):
    * per id, `added` (only in `next`), `removed` (only in `prev`), or
    * `changed` (both, different content digest). Unchanged rows are NOT
    * emitted — at corpus scale the diff is the small output, the
    * identity is the big one.
    *
    * Shuffle profile: both sides collapse to (id, md5) pairs before the
    * one full-outer join — 16-byte digests move, never documents (the
    * exact-dedup stance). Null-id rows identify nothing and are dropped
    * from both sides.
    */
  /** Change magnitude for the `changed` rows of a [[snapshotDiff]]: per
    * id present in BOTH versions with differing digests, the edit
    * distance between the versions and its e6-floored ratio to the
    * longer side — the triage signal between "recrawl touched a
    * timestamp" and "the page was rewritten" that decides whether
    * downstream dedup/embedding work re-runs.
    *
    * Scale note: the O(len²) distance runs ONLY on the changed ids —
    * the digest pre-filter (16-byte join, documents joined back by id)
    * keeps the quadratic kernel off the unchanged bulk, which is the
    * entire point of diffing digests first.
    */
  def changeMagnitude(prev: DataFrame, next: DataFrame,
                      idCol: String, contentCol: String): DataFrame = {
    val changed = snapshotDiff(prev, next, idCol, contentCol)
      .filter(col("change") === "changed")
      .select(col(idCol))
    val p = prev.join(changed, Seq(idCol), "left_semi")
      .select(col(idCol), col(contentCol).as("__prev"))
    val n = next.join(changed, Seq(idCol), "left_semi")
      .select(col(idCol), col(contentCol).as("__next"))
    p.join(n, Seq(idCol))
      .select(col(idCol),
        levenshtein(col("__prev"), col("__next")).cast("long").as("dist"),
        expr("""CAST(levenshtein(__prev, __next) * 1000000L
          div greatest(length(__next), length(__prev), 1) AS BIGINT)""")
          .as("rel_e6"))
  }

  def snapshotDiff(prev: DataFrame, next: DataFrame,
                   idCol: String, contentCol: String): DataFrame = {
    // presence travels as its own flag: a NULL content digest must read
    // as "present with null content", never as "row absent"
    def digests(df: DataFrame, p: String, d: String): DataFrame = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol), lit(true).as(p),
        md5(col(contentCol).cast("string")).as(d))
    digests(prev, "__pp", "__dp")
      .join(digests(next, "__pn", "__dn"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__pp").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(!(col("__dp") <=> col("__dn")), "changed")
          .otherwise("unchanged").as("change"))
      .filter(col("change") =!= "unchanged")
  }
}
