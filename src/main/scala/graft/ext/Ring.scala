package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Consistent-hash ring sharding (Karger et al. 1997): assign keys to
  * shards so that RESIZING the fleet moves only ~1/(n+1) of the keys —
  * against `key mod n`, where adding one shard remaps almost
  * everything. This is how a 100 TB store reshards without a full
  * rewrite: only the keys whose ring arc changed owners migrate.
  *
  * Spark-first shape: the ring (shards × vnodes points, each a 48-bit
  * md5 of "salt|shard|vnode") is CONFIG-sized, so it compiles into two
  * aligned literal arrays — sorted points and their shard ids — and
  * the per-key owner lookup (`first ring point ≥ hash(key)`, wrapping)
  * is a pure codegen'd filter-count over those literals: NO join, NO
  * shuffle, assignment is a column function exactly like
  * [[graft.ext.Layout.shuffleShards]]' modular variant. Virtual nodes
  * smooth the arc lengths; the same construction replays in any engine
  * with md5 (the gate oracle rebuilds the identical ring).
  */
object Ring {

  /** The sorted ring: (points ascending, aligned shard ids). */
  private[graft] def ringPoints(nShards: Int, vnodes: Int,
                                salt: String): (Array[Long], Array[Int]) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val entries = for {
      s <- 0 until nShards
      v <- 0 until vnodes
    } yield {
      val hx = md.digest(s"$salt|$s|$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hx.substring(0, 12), 16), s)
    }
    val sorted = entries.sortBy(_._1).toArray
    // 48-bit collisions across a few thousand points are ~2^-28-rare,
    // but the contract must not depend on luck
    require(sorted.map(_._1).distinct.length == sorted.length,
      s"ring point collision at nShards=$nShards vnodes=$vnodes — " +
        "change the salt")
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** Shard id (0-based) of `key` on the (nShards × vnodes) ring:
    * `hash48(key)` walks clockwise to the first ring point ≥ it,
    * wrapping past the top to the smallest point. Pure column
    * arithmetic over literal arrays — usable in a scan projection, a
    * `partitionBy`, or a write path.
    */
  def consistentShard(key: Column, nShards: Int, vnodes: Int = 64,
                      salt: String = "ring-v1"): Column = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096], got $nShards")
    require(vnodes >= 1 && vnodes <= 1024,
      s"vnodes must be in [1, 1024], got $vnodes")
    require(nShards.toLong * vnodes <= 65536,
      s"ring size ${nShards.toLong * vnodes} exceeds the literal-array " +
        "stance (65536 points); shard a namespace level first")
    require(salt.nonEmpty, "salt must not be empty")
    val (points, shards) = ringPoints(nShards, vnodes, salt)
    val h = conv(substring(md5(key.cast("string")), 1, 12), 16, 10)
      .cast("long")
    // index of the first point >= h (1-based), wrapping to 1
    val below = IntLadder.countBelow(points, h, strict = true)
    val idx = when(below === lit(points.length), lit(1))
      .otherwise(below + lit(1))
    element_at(typedlit(shards.toSeq), idx)
  }
}
