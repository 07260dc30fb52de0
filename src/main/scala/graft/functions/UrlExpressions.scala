package graft.functions

import graft.text.Urls
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Static lookup backend for [[PslDomain]]: the full Public Suffix List
  * ([[Urls.pslRules]], ~9.5k rules parsed from the vendored classpath
  * resource) compiled into one per-JVM hash index. The index is
  * jar-resident state like a stopword table — it builds once per
  * executor on first use, so the expression serializes as a bare node
  * and never ships or broadcasts the rule table with the plan.
  *
  * Semantics are EXACTLY [[Urls.registeredDomainsPsl]]'s (the join-shaped
  * whole-operator path, which remains the right tool when the PSL itself
  * is a refreshed TABLE rather than the vendored snapshot): candidate
  * suffix forms (exact + `*.`-starred), exception-wins / longest-match /
  * bare-TLD-default resolution, rule matching on the Unicode-lowered
  * host, output casing preserved, IPs / single labels / hosts that ARE a
  * public suffix pass through verbatim. UrlExpressionsSpec pins the two
  * paths row-equal over the rule-class battery.
  */
object PslHelper {
  /** rkey → flag bits (1 = concrete/wildcard rule, 2 = exception rule). */
  private lazy val rules: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](Urls.pslRules.size * 2)
    Urls.pslRules.foreach { r =>
      val prev: Integer = m.getOrDefault(r.rkey, 0)
      m.put(r.rkey, prev | (if (r.rexc) 2 else 1))
    }
    m
  }

  /** Called from generated code. Null-safe via nullSafeEval/codegen. */
  def registeredDomain(host: UTF8String): UTF8String = {
    val orig = host.toString
    // ^[0-9.]+$ pass-through, same predicate as the join path's rlike
    var isIp = orig.length > 0
    var i = 0
    while (isIp && i < orig.length) {
      val ch = orig.charAt(i)
      if (!((ch >= '0' && ch <= '9') || ch == '.')) isIp = false
      i += 1
    }
    if (isIp) return host
    // rule matching on the lowered form — UTF8String.toLowerCase is the
    // SAME locale-independent lowering Spark's lower() applies in the
    // join path, so the two paths can never disagree on a host
    val lparts = host.toLowerCase.toString.split("\\.", -1)
    val n = lparts.length
    var excPs = Int.MaxValue // min (k-1) over matching exception rules
    var matchPs = 0          // max k over matching concrete/wildcard rules
    var suffixKm1 = ""       // the host's last (k-1) labels, dot-joined
    var k = 1
    while (k <= n) {
      val suffixK =
        if (k == 1) lparts(n - 1) else lparts(n - k) + "." + suffixKm1
      val exact = rules.get(suffixK)
      if (exact != null) {
        if ((exact & 2) != 0 && k - 1 < excPs) excPs = k - 1
        if ((exact & 1) != 0 && k > matchPs) matchPs = k
      }
      if (k >= 2) {
        val starred = rules.get("*." + suffixKm1)
        if (starred != null) {
          if ((starred & 2) != 0 && k - 1 < excPs) excPs = k - 1
          if ((starred & 1) != 0 && k > matchPs) matchPs = k
        }
      }
      suffixKm1 = suffixK
      k += 1
    }
    val ps =
      if (excPs != Int.MaxValue) excPs else if (matchPs > 0) matchPs else 1
    if (n <= ps) return host
    // slice the ORIGINAL host's labels: registered_domain keeps casing.
    // Lowercasing never adds or removes '.', so label counts agree.
    val oparts = orig.split("\\.", -1)
    val sb = new java.lang.StringBuilder()
    var j = n - ps - 1
    while (j < n) {
      if (j > n - ps - 1) sb.append('.')
      sb.append(oparts(j))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_psl_domain(host)` — registered domain under the FULL Public
  * Suffix List as a scalar whole-stage-codegen expression: O(labels)
  * hash probes per row against the jar-resident index, zero joins, zero
  * shuffle. The scalar twin of [[graft.text.Urls.registeredDomainsPsl]]
  * for hosts already sitting in a column (SQL-surface consumers, scan-side
  * per-domain cap keys); the join path stays preferable only when the
  * rule table is itself data.
  */
case class PslDomain(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_psl_domain"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PslHelper.registeredDomain(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PslHelper.registeredDomain($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UrlExpressions {
  import org.apache.spark.sql.graft.ColumnShim.{column => toCol, expression => toExpr}

  def pslDomain(c: Column): Column = toCol(PslDomain(toExpr(c)))

  /** SQL registration (session-scoped), mirroring [[TextExpressions]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_psl_domain", exprs => PslDomain(exprs.head), "built-in")
}
