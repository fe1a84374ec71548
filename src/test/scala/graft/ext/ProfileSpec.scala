package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 20.0),
    (3L, None, 20.0),
    (4L, Some("a"), 30.0),
    (5L, None, 10.0)
  ).toDF("id", "cat", "v")

  test("exact profile: counts, nulls, distincts, min/max per column") {
    val p = Profile.columnProfile(df, Seq("id", "cat", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((5L, 0L, 5L, "1", "5")))
    assert(p("cat") == ((5L, 2L, 2L, "a", "b")))
    assert(p("v") == ((5L, 0L, 3L, "10.0", "30.0")))
  }

  test("approx profile: same shape, estimate within rsd, no Expand node") {
    val p = Profile.columnProfileApprox(df, Seq("id", "cat"), rsd = 0.01)
    val rows = p.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows("id") == 5L && rows("cat") == 2L) // tiny input: exact
    // the scale property: HLL profile must not plan the k-distinct Expand
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile planned an Expand:\n$plan")
    val exactPlan = Profile.columnProfile(df, Seq("id", "cat"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand")) // and the exact one does (k=2 distincts)
  }

  test("profile over an empty frame yields zero rows/nulls and null min/max") {
    val p = Profile.columnProfile(df.filter(col("id") < 0), Seq("id", "cat"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.isNullAt(4), r.isNullAt(5)))).toMap
    assert(p("id") == ((0L, 0L, 0L, true, true)))
    assert(p("cat") == ((0L, 0L, 0L, true, true)))
  }
}
