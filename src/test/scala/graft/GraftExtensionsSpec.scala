package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom kernels must be reachable from PURE SQL once the extension
  * is installed. Extensions bind at session BUILD: getOrCreate would
  * silently reuse another suite's extension-less active session, so this
  * spec detaches the active/default sessions, builds its own against the
  * shared SparkContext, and restores the previous ones after.
  */
class GraftExtensionsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private var prevDefault: Option[SparkSession] = None
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prevDefault.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
    super.afterAll()
  }

  test("vec_dot from SQL") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 11.0) < 1e-12)
  }

  test("parse_log_line from SQL: field access and miss") {
    val ok = spark.sql(
      """SELECT parse_log_line('o b [06/Feb/2019:00:00:38 +0000] ip r rid OP k "GET / HTTP/1.1" 200 - 1 2 3 4 "-" "ua" -').operation AS op""")
      .collect()(0).getString(0)
    assert(ok == "OP")
    val miss = spark.sql("SELECT parse_log_line('nope') IS NULL AS missed")
      .collect()(0).getBoolean(0)
    assert(miss)
  }

  test("word_ngrams + minhash_signature + simhash from SQL") {
    val sig = spark.sql(
      "SELECT minhash_signature(word_ngrams(split('a b c d', ' '), 2), 16) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 16)
    val sk = spark.sql("SELECT simhash(split('x y z', ' ')) AS h")
      .collect()(0).getLong(0)
    val sk2 = spark.sql("SELECT simhash(split('x y z', ' ')) AS h")
      .collect()(0).getLong(0)
    assert(sk == sk2)
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception](
      spark.sql("SELECT minhash_signature(array('a'), length('abc'))").collect())
    assert(e.getMessage.contains("integer literal"))
  }
  test("CollapsePathDate fuses the Days-Apart composite, results identical") {
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "logs/svc/2019/03/04/part-0.tgz",   // clean
      "logs/svc/2019/3/4/part-0.tgz",     // short fields: strict format -> null
      "logs/svc/2019/03/04/05/p.tgz",     // 4 digit groups -> join -> null
      "no digits here",                    // no matches -> "" -> null
      "a/1/b",                             // too few groups -> null
      "x/2020/12/31/y"                     // clean, different date
    )
    // non-foldable input so the composite survives constant folding
    val df = spark.createDataset(keys)(org.apache.spark.sql.Encoders.STRING)
      .toDF("key").repartition(2)
    val composite = try_to_timestamp(
      array_join(regexp_extract_all(col("key"), lit("/(\\d+)"), lit(1)), "-"),
      lit("yyyy-MM-dd"))
    val q = df.select(col("key"), composite.as("d"))

    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("path_date"),
      s"rule must fuse the composite:\n$optimized")

    val got = q.collect().map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    assert(got("logs/svc/2019/03/04/part-0.tgz")
      .contains(java.sql.Timestamp.valueOf("2019-03-04 00:00:00")))
    assert(got("x/2020/12/31/y")
      .contains(java.sql.Timestamp.valueOf("2020-12-31 00:00:00")))
    Seq("logs/svc/2019/3/4/part-0.tgz", "logs/svc/2019/03/04/05/p.tgz",
      "no digits here", "a/1/b").foreach(k => assert(got(k).isEmpty, k))

    // bit-identical to the unfused form (plain session, no extensions)
    val plain = graft.SparkTestBase.session
    val expected = plain.createDataset(keys)(org.apache.spark.sql.Encoders.STRING)
      .toDF("key")
      .select(col("key"), try_to_timestamp(
        array_join(regexp_extract_all(col("key"), lit("/(\\d+)"), lit(1)), "-"),
        lit("yyyy-MM-dd")).as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    assert(got == expected)
  }

  test("to_timestamp (failOnError) form is NOT rewritten") {
    import org.apache.spark.sql.functions._
    val df = spark.range(2).select(concat(lit("a/2019/03/0"), col("id")).as("key"))
    val strict = df.select(to_timestamp(
      array_join(regexp_extract_all(col("key"), lit("/(\\d+)"), lit(1)), "-"),
      "yyyy-MM-dd").as("d"))
    assert(!strict.queryExecution.optimizedPlan.toString.contains("path_date"),
      "only the try_ form has null-on-error semantics PathDate reproduces")
  }

  private val SampleLines = Seq(
    """o b [06/Feb/2019:00:00:38 +0000] ip r rid REST.GET.OBJECT k "GET / HTTP/1.1" 200 - 1 2 3 4 "-" "ua" -""",
    """o b [07/Feb/2019:00:00:38 +0000] ip r rid REST.GET.OBJECT k "GET / HTTP/1.1" 404 NoSuchKey 1 2 3 4 "-" "ua" -""",
    """o b [08/Feb/2019:00:00:38 +0000] ip r rid REST.PUT.OBJECT k "PUT / HTTP/1.1" 200 - 1 2 3 4 "-" "ua" -""",
    "garbage line")

  /** Lines as a FILE-backed frame: a LocalRelation would be filtered at
    * optimization time (ConvertToLocalRelation) and never reach FilterExec.
    */
  private def rawLines(): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cse-test")
    java.nio.file.Files.write(dir.resolve("lines.txt"),
      SampleLines.mkString("\n").getBytes("UTF-8"))
    spark.read.text(dir.toString).repartition(2)
  }

  test("DedupFilterSubexprs: repeated parse in a filter is evaluated once") {
    import org.apache.spark.sql.functions._
    val raw = rawLines()
    val q = graft.logs.LogLineParser.parse(raw)
      .filter(col("operation") === "REST.GET.OBJECT" && col("http_status") < 300)
      .select("request_id")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("rid"),
      "rewritten filter must keep exact semantics")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("_graft_filter_cse_0"),
      s"filter with a repeated parse must be rewritten:\n$physical")
    // the filter's own predicate references the shared alias, not fresh
    // parse_log_line calls: every parse in the plan sits in a Project
    // ("Filter (" = the operator node; the FileScan line's DataFilters
    // echo the original predicate and are not executed there)
    val filterLines = physical.split("\n").filter(_.contains("Filter ("))
    assert(filterLines.exists(_.contains("_graft_filter_cse_0")), physical)
    assert(!filterLines.exists(_.contains("parse_log_line")),
      s"no parse may remain inside the Filter predicate:\n$physical")
  }

  test("DedupFilterSubexprs: cheap first conjunct blocks the rewrite (short-circuit guard)") {
    import org.apache.spark.sql.functions._
    val raw = rawLines()
    // first conjunct is cheap and selective: pre-evaluating the parse for
    // every row would defeat predicate short-circuiting
    val q = raw.filter(
      length(col("value")) > 500 &&
        expr("parse_log_line(value).operation") === "REST.GET.OBJECT" &&
        expr("parse_log_line(value).status") === "200")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("_graft_filter_cse"),
      s"cheap-first-conjunct filter must not be rewritten:\n$physical")
  }
}
