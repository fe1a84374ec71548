package graft.analysis

/** Translates the reference's Athena/Hive DDL files into Spark SQL, so
  * that EVERY file in `example_queries/` executes against this engine:
  * the external-table DDL (`create_table.sql:13-42`), partition discovery
  * (`load_all_partitions.sql:6`), and single-partition registration
  * (`load_partition.sql:8-10`) — completing what [[PrestoSqlTranslator]]
  * does for the analysis query. The only edits applied are the ones the
  * files themselves instruct ("Change the ... Location", "Set the
  * datetime (dt)"): everything else is preserved, backticked hyphenated
  * table name included.
  */
object AthenaDdl {

  /** Drop full-line `--`/`---` comment lines (the files use prose
    * headers, never trailing comments).
    */
  def stripComments(sql: String): String =
    sql.linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n").trim

  /** Spark's session catalog restricts PERSISTENT table names to
    * `[A-Za-z0-9_]` (hyphens are fine for Athena — and for Spark temp
    * views — but `CREATE TABLE` refuses them regardless of backticks).
    * Deterministic mapping: hyphens inside backticked identifiers become
    * underscores. Apply the same call to the analysis SQL so every file
    * resolves the same table.
    */
  def normalizeIdentifiers(sql: String): String =
    "`[^`]+`".r.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(m.matched.replace('-', '_')))

  private val CreateTablePattern =
    ("(?s)^CREATE\\s+EXTERNAL\\s+TABLE\\s+(`[^`]+`)\\s*\\((.*?)\\)\\s*" +
      "PARTITIONED\\s+BY\\s*\\((.*?)\\)\\s*" +
      "ROW\\s+FORMAT\\s+SERDE\\s*'([^']*)'\\s*" +
      "STORED\\s+AS\\s+INPUTFORMAT\\s*'([^']*)'\\s*" +
      "OUTPUTFORMAT\\s*'([^']*)'\\s*" +
      "LOCATION\\s*'[^']*'\\s*$").r

  /** Hive external-table DDL → Spark `CREATE TABLE ... USING parquet`.
    * The SerDe/InputFormat/OutputFormat triple is verified to be the
    * Parquet stack before being collapsed into `USING parquet` (anything
    * else would need a different source and is refused loudly); the
    * partition columns move into the column list (Spark DDL declares
    * them there); LOCATION is overridden to `location` — the file's own
    * LOCATION is the placeholder bucket its header says to change.
    */
  def translateCreateTable(sql: String, location: String): String = {
    val s = stripComments(sql)
    val m = CreateTablePattern.findFirstMatchIn(s).getOrElse(
      throw new IllegalArgumentException(
        s"not a recognizable Hive external-table DDL:\n$s"))
    val (name, cols, partCols) = (m.group(1), m.group(2).trim, m.group(3).trim)
    val stack = Seq(m.group(4), m.group(5), m.group(6))
    require(stack.forall(_.toLowerCase.contains("parquet")),
      s"only the Parquet SerDe stack is supported, got: $stack")
    val partNames = "`([^`]+)`".r.findAllMatchIn(partCols).map(_.group(1)).toSeq
    require(partNames.nonEmpty, s"no partition columns parsed from: $partCols")
    normalizeIdentifiers(
      s"""CREATE TABLE $name (
         |  $cols,
         |  $partCols)
         |USING parquet
         |PARTITIONED BY (${partNames.map(n => s"`$n`").mkString(", ")})
         |LOCATION '${location.replace("'", "''")}'""".stripMargin)
  }

  /** `MSCK REPAIR TABLE` is native Spark SQL — only the prose header goes. */
  def translateRepair(sql: String): String =
    normalizeIdentifiers(stripComments(sql))

  /** `ALTER TABLE ... ADD PARTITION ... LOCATION` is native Spark SQL;
    * applies the file's instructed substitutions: the `dt='YYYY-MM-DD'`
    * placeholder value and the partition LOCATION.
    */
  def translateAddPartition(sql: String, dt: String, location: String): String = {
    // replacement strings are quoted: a '$' or '\' in a path (both legal
    // in S3 keys and local paths) must land literally, not as a regex
    // group reference
    import java.util.regex.Matcher.quoteReplacement
    normalizeIdentifiers(stripComments(sql))
      .replaceAll("dt='[^']*'", quoteReplacement(s"dt='$dt'"))
      .replaceAll("(?s)LOCATION\\s*'[^']*'",
        quoteReplacement(s"LOCATION '${location.replace("'", "''")}'"))
  }
}
