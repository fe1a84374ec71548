package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("upsert replaces on key, appends new keys, passes the rest through") {
    val updates = Seq((2L, "B", 99.0), (9L, "i", 1.0)).toDF("k", "name", "v")
    val out = Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (9L, "i", 1.0)))
  }

  test("upsertVersioned: max version per key wins within the batch") {
    val updates = Seq(
      (2L, "old", 1.0, 1L), (2L, "new", 2.0, 5L), (2L, "mid", 1.5, 3L),
      (9L, "x", 9.0, 1L)
    ).toDF("k", "name", "v", "version")
    val out = Merge.upsertVersioned(
        base.withColumn("version", lit(0L)), updates, Seq("k"), "version")
      .orderBy("k").select("k", "name").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "new"), (3L, "c"), (9L, "x")))
  }

  test("upsert with an empty update batch is the identity") {
    val out = Merge.upsert(base, base.filter(col("k") < 0), Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("null-key update rows are dropped; repeated merges do not accumulate them") {
    val updates = Seq(
      (Option(2L), "B", 99.0), (Option.empty[Long], "ghost", -1.0)
    ).toDF("k", "name", "v")
    val withNullBase = base.unionByName(
      Seq((Option.empty[Long], "keepme", 7.0)).toDF("k", "name", "v")
        .select(col("k"), col("name"), col("v")))
    val once = Merge.upsert(withNullBase, updates, Seq("k"))
    val twice = Merge.upsert(once, updates, Seq("k"))
    val names = twice.orderBy("k").select("name").as[String].collect().toSeq
    // base's null-key row survives untouched; the update's null-key row
    // never lands — even after merging the same batch twice
    assert(names.count(_ == "keepme") == 1)
    assert(!names.contains("ghost"))
    assert(twice.count() == 4) // 1,2,3 + the base null-key row
  }

  test("small update side stays broadcast: base never exchanges on the key") {
    val big = spark.range(0, 10000).select(col("id").as("k"),
      col("id").cast("string").as("name"), col("id").cast("double").as("v"))
    val small = Seq((5L, "u", 0.0)).toDF("k", "name", "v")
    val plan = Merge.upsert(big, small, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected the anti join to broadcast the update keys:\n$plan")
  }

  test("snapshotDiff: added/removed/changed only; null content is a value") {
    val prev = Seq(
      (Option(1L), "a"), (Option(2L), "b"), (Option(3L), "c"),
      (Option(4L), null.asInstanceOf[String]), (Option(5L), "e"),
      (Option.empty[Long], "x"))
      .toDF("id", "text")
    val next = Seq(
      (Option(2L), "b"), (Option(3L), "C!"), (Option(4L), "now set"),
      (Option(5L), null.asInstanceOf[String]), (Option(6L), "new"))
      .toDF("id", "text")
    val got = Merge.snapshotDiff(prev, next, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "removed",            // only in prev
      3L -> "changed",            // digest differs
      4L -> "changed",            // null → value IS a change
      5L -> "changed",            // value → null IS a change
      6L -> "added"))             // only in next
    // 2 (identical) emits nothing; the null-id prev row is dropped
  }

  test("changeMagnitude: distances only for changed ids; ratio floors") {
    val prev = Seq((1L, "hello world"), (2L, "same"), (3L, "abcdef"),
      (4L, "only prev")).toDF("id", "text")
    val next = Seq((1L, "hello brave world"), (2L, "same"), (3L, "abXdYf"),
      (5L, "only next")).toDF("id", "text")
    val got = Merge.changeMagnitude(prev, next, "id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // 1: 6-char insertion; 3: two substitutions; 2 unchanged, 4/5 absent
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == ((6L, 6L * 1000000 / 17)))
    assert(got(3L) == ((2L, 2L * 1000000 / 6)))
  }
}
