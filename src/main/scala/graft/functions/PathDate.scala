package graft.functions

import java.util.regex.Pattern

import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.expressions.{ArrayJoin, Expression, GetTimestamp, Literal, RegExpExtractAll, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{LegacyDateFormats, TimestampFormatter}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass "date buried in a path" extractor: the fused form of the
  * Days Apart chain `try_to_timestamp(array_join(regexp_extract_all(key,
  * pattern, group), sep), format)` (`days_apart_analysis.sql:18,22` —
  * `/2019/03/04/` → "2019-03-04" → timestamp).
  *
  * The composite executes a regex scan producing an array, allocates the
  * array, joins it to a second string, then parses — three materialized
  * intermediates per row on the flagship query's hot path. This expression
  * does one matcher loop into one StringBuilder and parses with the SAME
  * `TimestampFormatter` configuration `try_to_timestamp` uses (strict,
  * SIMPLE_DATE_FORMAT legacy profile), so results are identical bit for
  * bit, including the null-on-garbage cases: no digit groups → "" → null;
  * extra groups → "2019-03-04-05" → null; short year forms → strict
  * format rejection → null.
  */
case class PathDate(child: Expression, pattern: String, group: Int, sep: String,
                    format: String, timeZoneId: Option[String] = None)
  extends UnaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "path_date"

  override def withTimeZone(timeZoneId: String): PathDate =
    copy(timeZoneId = Some(timeZoneId))

  @transient private lazy val compiled = Pattern.compile(pattern)
  @transient private lazy val formatter = TimestampFormatter(
    format, zoneId, LegacyDateFormats.SIMPLE_DATE_FORMAT, isParsing = true)

  /** Public static-shape entry for both eval and generated code. */
  def evalInput(input: UTF8String): Any = {
    val m = compiled.matcher(input.toString)
    val sb = new java.lang.StringBuilder
    var first = true
    while (m.find()) {
      if (!first) sb.append(sep)
      val g = m.group(group)
      // regexp_extract_all appends "" for a null (unmatched) group
      if (g != null) sb.append(g)
      first = false
    }
    try java.lang.Long.valueOf(formatter.parse(sb.toString))
    catch { case NonFatal(_) => null }
  }

  override def nullSafeEval(input: Any): Any =
    evalInput(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pathDate", this, classOf[PathDate].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object pdRes = $ref.evalInput($c);
         |if (pdRes == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) pdRes).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PathDate =
    copy(child = newChild)
}

/** Optimizer rule fusing the exact Days-Apart composite into [[PathDate]].
  * Matches only the `try_` (failOnError = false) timestamp form with all
  * arguments literal, and only when the format is constructible — anything
  * else is left to the built-ins. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`), so it applies to
  * DataFrame and SQL queries alike with zero call-site changes.
  */
object CollapsePathDate extends Rule[LogicalPlan] {

  private def formatterOk(fmt: String): Boolean =
    try { TimestampFormatter(fmt, java.time.ZoneOffset.UTC,
      LegacyDateFormats.SIMPLE_DATE_FORMAT, isParsing = true); true }
    catch { case NonFatal(_) => false }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case g: GetTimestamp if !g.failOnError && g.dataType == TimestampType =>
      (g.left, g.right) match {
        case (ArrayJoin(
            RegExpExtractAll(key,
              Literal(pat: UTF8String, StringType),
              Literal(grp: Int, IntegerType)),
            Literal(sep: UTF8String, StringType), None),
            Literal(fmt: UTF8String, StringType))
          if formatterOk(fmt.toString) =>
          PathDate(key, pat.toString, grp, sep.toString, fmt.toString, g.timeZoneId)
        case _ => g
      }
  }
}
