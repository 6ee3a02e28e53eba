package graft.api

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._

/** Milvus boolean-expression filter STRINGS → engine [[Column]]s — the
  * exact argument shape a migrating client passes: the reference calls
  * `client.delete(filter = f'url == "{url}"')` and
  * `client.query(filter="", ...)`
  * (`milvus-app/pythonvectordbceph_milvus.py:108-111`,
  * `milvus-app/describe.py:28`). [[GraftClient.milvusFilter]] is the
  * entry point; the result composes with every filtered surface
  * (queryWhere / deleteWhere / search / iterators) and — because bare
  * field names rewrite to the SAME `meta['f']` shape the scalar-prune
  * extractor matches — a string filter on an indexed field bucket-prunes
  * automatically.
  *
  * Translation rules:
  *   - Spark SQL's parser does the heavy lifting (its boolean grammar is
  *     a superset: ==, !=, <, <=, >, >=, AND/OR/NOT, IN, LIKE, parens,
  *     single- OR double-quoted strings). Milvus spellings Spark SQL
  *     lacks are pre-tokenized OUTSIDE string literals: `&&`/`||`/`!` →
  *     AND/OR/NOT (`!=` untouched), and an `in [...]` literal list →
  *     `in (...)`.
  *   - Bare identifiers other than the engine's row columns (key, vec,
  *     meta) are Milvus FIELD references → `meta['<name>']`; explicit
  *     `meta['name']` accesses pass through unchanged.
  *   - Milvus scalar fields are typed; engine metadata is MAP<STRING,
  *     STRING>. A comparison/IN against a NUMERIC literal therefore
  *     casts the field to DOUBLE (`price > 5` must compare numerically,
  *     not lexically — "10" < "5" as strings); a BOOLEAN literal casts
  *     to BOOLEAN. String comparisons stay raw — which keeps equality/IN
  *     in the scalar index's posting-list shape; numeric compares and
  *     ranges prune through the index's per-bucket zone maps instead.
  *     The cast follows the session's cast semantics: under ANSI
  *     (Spark's default) a malformed value — a row with price =
  *     "cheap" under `price > 5` — RAISES at query time, the engine's
  *     analogue of typed Milvus rejecting the value at insert; with
  *     ANSI off it nulls out and the row silently drops.
  *   - `TEXT_MATCH`/`PHRASE_MATCH`/`json_contains` conjuncts are
  *     rejected loudly with the engine's equivalent named (matchTerms /
  *     get_json_object) — failing at parse beats silently resolving to
  *     a missing function at analysis.
  */
object MilvusFilter {
  private val RowColumns = Set("key", "vec", "meta")
  private val Unsupported = Map(
    "text_match" -> "pass matchTerms/matchMode to search/queryWhere instead",
    "phrase_match" -> "pass matchTerms with mode=\"all\" (order-insensitive) instead",
    "json_contains" -> "filter with get_json_object over the meta value instead",
    "json_contains_all" -> "filter with get_json_object over the meta value instead",
    "json_contains_any" -> "filter with get_json_object over the meta value instead")

  def parse(filter: String): Column = {
    require(filter != null && filter.trim.nonEmpty,
      "empty filter — Milvus filter=\"\" means no predicate: pass None / lit(true)")
    // parse to the CATALYST tree directly: an expr() Column wraps the
    // raw SQL in a lazy SqlExpression node, so the rewrites below would
    // see one opaque leaf instead of the attribute/comparison tree
    val parsed = CatalystSqlParser.parseExpression(preprocess(filter))
    GraftShim.column(typedCompares(rejectFieldToField(rewriteFields(parsed))))
  }

  /** Milvus has no field-to-field comparison, so `lang == en` is a PARSE
    * ERROR there (`en` is an unquoted string value) — but the bare-field
    * rewrite above would quietly turn it into `meta['lang'] ==
    * meta['en']`, a null-compare that returns an EMPTY result: a typo'd
    * filter silently matching nothing instead of failing loudly. Mirror
    * Milvus and reject any comparison whose sides BOTH resolved to meta
    * accesses, naming the likely missing quotes. */
  private def rejectFieldToField(e: Expression): Expression = {
    e.foreach {
      case c: BinaryComparison if isMetaAccess(c.left) && isMetaAccess(c.right) =>
        val rhs = c.right match {
          case UnresolvedExtractValue(_, Literal(k, _)) => String.valueOf(k)
          case _ => "<field>"
        }
        throw new IllegalArgumentException(
          "field-to-field comparison is not valid Milvus filter syntax — " +
            s"if '$rhs' is a string VALUE, quote it: ... == \"$rhs\"")
      case _ =>
    }
    e
  }

  /** Milvus spellings → Spark SQL, outside string literals. */
  private[api] def preprocess(s: String): String = {
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0
    var listDepth = 0 // open `in [` lists awaiting their `]`
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == '\\' && i + 1 < s.length) { out.append(s.charAt(i + 1)); i += 1 }
        else if (c == quote) quote = 0
        i += 1
      } else c match {
        case '\'' | '"' =>
          quote = c; out.append(c); i += 1
        case '&' if i + 1 < s.length && s.charAt(i + 1) == '&' =>
          out.append(" and "); i += 2
        case '|' if i + 1 < s.length && s.charAt(i + 1) == '|' =>
          out.append(" or "); i += 2
        case '!' if i + 1 >= s.length || s.charAt(i + 1) != '=' =>
          out.append(" not "); i += 1
        case '[' if endsWithKeyword(out, "in") =>
          listDepth += 1; out.append('('); i += 1
        case ']' if listDepth > 0 =>
          listDepth -= 1; out.append(')'); i += 1
        case _ =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  // does the processed prefix end with the given bare keyword (then
  // optional whitespace)? — distinguishes an `in [...]` literal list
  // from a `meta["k"]` extraction bracket
  private def endsWithKeyword(sb: StringBuilder, kw: String): Boolean = {
    var j = sb.length - 1
    while (j >= 0 && sb.charAt(j).isWhitespace) j -= 1
    val end = j
    while (j >= 0 && (sb.charAt(j).isLetterOrDigit || sb.charAt(j) == '_')) j -= 1
    end - j == kw.length &&
      sb.substring(j + 1, end + 1).equalsIgnoreCase(kw)
  }

  /** Bare Milvus field references → `meta['<name>']`. */
  private def rewriteFields(e: Expression): Expression = e.transformUp {
    case f: UnresolvedFunction
        if Unsupported.contains(f.nameParts.last.toLowerCase) =>
      throw new IllegalArgumentException(
        s"Milvus ${f.nameParts.last.toUpperCase} is not expressible as a " +
          s"row predicate here — ${Unsupported(f.nameParts.last.toLowerCase)}")
    case a: UnresolvedAttribute
        if a.nameParts.length == 1 &&
          !RowColumns.contains(a.nameParts.head.toLowerCase) =>
      UnresolvedExtractValue(UnresolvedAttribute(Seq("meta")),
        Literal(a.nameParts.head))
  }

  private def isMetaAccess(e: Expression): Boolean = e match {
    case UnresolvedExtractValue(a: UnresolvedAttribute, _) =>
      a.nameParts == Seq("meta")
    case _ => false
  }

  /** Typed-field semantics over string metadata: numeric/boolean literal
    * on one side ⇒ cast the field side. String compares stay raw (the
    * scalar-prunable shape). */
  private def typedCompares(e: Expression): Expression = e.transformUp {
    case c: BinaryComparison if isMetaAccess(c.left) && litOf[NumericType](c.right) =>
      c.withNewChildren(Seq(Cast(c.left, DoubleType), c.right))
    case c: BinaryComparison if litOf[NumericType](c.left) && isMetaAccess(c.right) =>
      c.withNewChildren(Seq(c.left, Cast(c.right, DoubleType)))
    case c: BinaryComparison if isMetaAccess(c.left) && boolLit(c.right) =>
      c.withNewChildren(Seq(Cast(c.left, BooleanType), c.right))
    case c: BinaryComparison if boolLit(c.left) && isMetaAccess(c.right) =>
      c.withNewChildren(Seq(c.left, Cast(c.right, BooleanType)))
    case In(v, list) if isMetaAccess(v) && list.nonEmpty &&
        list.forall(litOf[NumericType]) =>
      In(Cast(v, DoubleType), list)
  }

  private def litOf[T <: DataType : scala.reflect.ClassTag](e: Expression): Boolean =
    e match {
      case l: Literal =>
        scala.reflect.classTag[T].runtimeClass.isInstance(l.dataType)
      case _ => false
    }

  private def boolLit(e: Expression): Boolean = e match {
    case Literal(_, BooleanType) => true
    case _ => false
  }
}
