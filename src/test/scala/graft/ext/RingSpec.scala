package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RingSpec extends SparkTestBase {
  import spark.implicits._

  private def scalaShard(key: String, nShards: Int, vnodes: Int): Int = {
    val (points, shards) = Ring.ringPoints(nShards, vnodes, "ring-v1")
    val hx = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hx.substring(0, 12), 16)
    val i = points.indexWhere(_ >= h)
    shards(if (i < 0) 0 else i) // wrap past the top point
  }

  test("consistentShard matches an independent Scala ring walk") {
    val keys = (0 until 2000).map(i => s"key-$i")
    val got = keys.toDF("k")
      .select(col("k"), Ring.consistentShard(col("k"), 8).as("s"))
      .as[(String, Int)].collect().toMap
    keys.foreach { k =>
      assert(got(k) == scalaShard(k, 8, 64), s"shard($k)")
    }
  }

  test("ring loads are balanced with vnodes; resize moves ~1/(n+1)") {
    val n = 30000
    val keys = spark.range(n).select(concat(lit("u"), col("id")).as("k"))
    val both = keys.select(
        Ring.consistentShard(col("k"), 8).as("s8"),
        Ring.consistentShard(col("k"), 9).as("s9"),
        pmod(xxhash64(col("k")), lit(8)).as("m8"),
        pmod(xxhash64(col("k")), lit(9)).as("m9"))
      .collect()
    val loads = both.groupBy(_.getInt(0)).view.mapValues(_.length)
    assert(loads.size == 8)
    val (mx, mn) = (loads.values.max, loads.values.min)
    assert(mx.toDouble / mn < 1.8, s"ring imbalance: max $mx min $mn")
    // consistent hashing: only the arcs the 9th shard claimed move
    val movedRing = both.count(r => r.getInt(0) != r.getInt(1)).toDouble / n
    assert(movedRing > 0.05 && movedRing < 0.20,
      s"ring movement $movedRing should be near 1/9")
    // mod-n: almost everything moves
    val movedMod = both.count(r => r.getLong(2) != r.getLong(3)).toDouble / n
    assert(movedMod > 0.8, s"mod movement $movedMod should be near 8/9")
    // keys that moved under the ring moved TO the new shard only
    both.filter(r => r.getInt(0) != r.getInt(1))
      .foreach(r => assert(r.getInt(1) == 8,
        s"ring move must target the added shard, got ${r.getInt(1)}"))
  }

  test("degenerate and invalid ring parameters fail loudly") {
    intercept[IllegalArgumentException](
      Ring.consistentShard(col("k"), 0))
    intercept[IllegalArgumentException](
      Ring.consistentShard(col("k"), 4096, 1024))
    // one shard: everything lands on it
    val one = Seq("a", "b", "c").toDF("k")
      .select(Ring.consistentShard(col("k"), 1).as("s"))
      .as[Int].collect().toSet
    assert(one == Set(0))
  }
}
