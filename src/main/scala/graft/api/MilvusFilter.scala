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
  *   - `json_contains` / `json_contains_any` / `json_contains_all` over
  *     a JSON-valued meta field translate to membership checks over
  *     `from_json(meta['f'], 'array<string>')` — see [[jsonContains]]
  *     for the (documented) canonicalization semantics.
  *   - `TEXT_MATCH`/`PHRASE_MATCH` conjuncts are NOT row predicates (the
  *     store keeps no text): [[parse]] rejects them naming the engine
  *     surface; [[parseWithMatches]] SPLITS them out as match gates —
  *     (terms, mode) pairs for `matchTerms`/`matchMode`/`matchGates` on
  *     search/queryWhere/deleteWhere — and translates the rest.
  */
object MilvusFilter {
  private val RowColumns = Set("key", "vec", "meta")
  private val MatchFns = Set("text_match", "phrase_match")
  private val Unsupported = Map(
    "text_match" -> ("pass matchTerms/matchMode to search/queryWhere, or " +
      "parse the whole string with milvusFilterWithMatches"),
    "phrase_match" -> ("pass matchTerms with matchMode=\"phrase\", or " +
      "parse the whole string with milvusFilterWithMatches"))

  def parse(filter: String): Column = {
    require(filter != null && filter.trim.nonEmpty,
      "empty filter — Milvus filter=\"\" means no predicate: pass None / lit(true)")
    // parse to the CATALYST tree directly: an expr() Column wraps the
    // raw SQL in a lazy SqlExpression node, so the rewrites below would
    // see one opaque leaf instead of the attribute/comparison tree
    val parsed = CatalystSqlParser.parseExpression(preprocess(filter))
    translate(parsed)
  }

  private def translate(e: Expression): Column =
    GraftShim.column(typedCompares(rejectFieldToField(rewriteFields(e))))

  /** [[parse]] for filters that may carry `TEXT_MATCH` / `PHRASE_MATCH`
    * conjuncts — the full Milvus 2.5 `filter=` grammar: top-level AND
    * match conjuncts split off as (terms, mode) gates ("any" for
    * TEXT_MATCH's OR-of-terms, "phrase" for PHRASE_MATCH's in-order
    * adjacency), the remaining conjuncts translated as [[parse]] does.
    * Returns (row predicate if any non-match conjunct remains, gates).
    * A match call anywhere ELSE (under OR/NOT) is rejected: a gate is a
    * candidate restriction, and only a top-level conjunct is implied by
    * the whole filter. PHRASE_MATCH's optional slop argument (≥ 0)
    * becomes mode "phrase" (0, exact adjacency — Milvus's default) or
    * "phrase:N" (Lucene sloppy-phrase window, which Milvus's slop
    * mirrors), both evaluated on the positional index. */
  def parseWithMatches(filter: String): (Option[Column], Seq[(Seq[String], String)]) = {
    require(filter != null && filter.trim.nonEmpty,
      "empty filter — Milvus filter=\"\" means no predicate: pass None / lit(true)")
    val parsed = CatalystSqlParser.parseExpression(preprocess(filter))
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    def isMatch(e: Expression): Boolean = e match {
      case f: UnresolvedFunction => MatchFns.contains(f.nameParts.last.toLowerCase)
      case _ => false
    }
    val (matches, rest) = conjuncts(parsed).partition(isMatch)
    rest.foreach(_.foreach {
      case f: UnresolvedFunction
          if MatchFns.contains(f.nameParts.last.toLowerCase) =>
        throw new IllegalArgumentException(
          s"${f.nameParts.last.toUpperCase} must be a TOP-LEVEL AND conjunct — " +
            "under OR/NOT it cannot gate candidates losslessly")
      case _ =>
    })
    val gates = matches.map { case f: UnresolvedFunction => matchGate(f) }
    (rest.reduceOption(And).map(translate), gates)
  }

  // one TEXT_MATCH/PHRASE_MATCH call → (terms, mode)
  private def matchGate(f: UnresolvedFunction): (Seq[String], String) = {
    val name = f.nameParts.last.toUpperCase
    val args = f.arguments
    require(args.length >= 2,
      s"$name needs (field, 'terms…'), got ${args.length} argument(s)")
    args.head match {
      case _: UnresolvedAttribute => // the indexed text field; the
        // engine's text index is collection-scoped, so the name is
        // informational — Milvus's per-field match index maps to it
      case other => throw new IllegalArgumentException(
        s"$name's first argument must be a field name, got $other")
    }
    val text = args(1) match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$name's second argument must be a string literal, got $other")
    }
    val terms = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, s"$name needs at least one term")
    if (name == "TEXT_MATCH") {
      require(args.length == 2, "TEXT_MATCH takes (field, 'terms…')")
      (terms, "any") // Milvus TEXT_MATCH: ANY of the analyzed terms
    } else {
      val slop = args.drop(2) match {
        case Seq() => 0L
        case Seq(Literal(v, t))
            if t == IntegerType || t == LongType || t == ShortType ||
              t == ByteType =>
          v.toString.toLong
        case other => throw new IllegalArgumentException(
          s"PHRASE_MATCH slop must be an integer literal, got $other")
      }
      require(slop >= 0L && slop <= Int.MaxValue,
        s"PHRASE_MATCH slop must be a non-negative int (got $slop)")
      // slop rides the mode string ("phrase" = exact adjacency, the
      // Milvus default; "phrase:N" = Lucene sloppy-phrase window N) —
      // TextIndex.matchingDocs parses it back out, so the (terms, mode)
      // gate tuple every search surface threads stays shape-stable
      (terms, if (slop == 0L) "phrase" else s"phrase:$slop")
    }
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

  /** Milvus spellings → Spark SQL, outside string literals. Brackets
    * carry three meanings in the Milvus grammar and each `[` is
    * classified as it streams past (a stack pairs its `]`):
    *   - `in [...]` literal list → `in (...)`;
    *   - a VALUE-position array literal (`json_contains(tags, [1, 2])`,
    *     nested ones included) → `array(...)` — recognized because the
    *     previous non-space char opens an expression (`(`, `,`, an
    *     operator, or the string start);
    *   - an extraction bracket (`meta["k"]`, after an identifier/`]`/
    *     `)`) → untouched. */
  private[api] def preprocess(s: String): String = {
    val out = new StringBuilder
    var i = 0
    var quote: Char = 0
    var converted = List.empty[Boolean] // per open `[`: was it rewritten?
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
        case '[' =>
          if (endsWithKeyword(out, "in")) {
            converted ::= true; out.append('(')
          } else if (lastNonSpace(out).forall(p =>
              !(p.isLetterOrDigit || p == '_' || p == ']' || p == ')' ||
                p == '"' || p == '\''))) {
            converted ::= true; out.append("array(")
          } else {
            converted ::= false; out.append('[')
          }
          i += 1
        case ']' if converted.nonEmpty =>
          out.append(if (converted.head) ')' else ']')
          converted = converted.tail; i += 1
        case _ =>
          out.append(c); i += 1
      }
    }
    out.toString
  }

  private def lastNonSpace(sb: StringBuilder): Option[Char] = {
    var j = sb.length - 1
    while (j >= 0 && sb.charAt(j).isWhitespace) j -= 1
    if (j >= 0) Some(sb.charAt(j)) else None
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

  /** Bare Milvus field references → `meta['<name>']`; `json_contains*`
    * → membership predicates; match functions rejected with the engine
    * surface named. */
  private def rewriteFields(e: Expression): Expression = e.transformUp {
    case f: UnresolvedFunction
        if Unsupported.contains(f.nameParts.last.toLowerCase) =>
      throw new IllegalArgumentException(
        s"Milvus ${f.nameParts.last.toUpperCase} is not expressible as a " +
          s"row predicate here — ${Unsupported(f.nameParts.last.toLowerCase)}")
    case f: UnresolvedFunction
        if JsonFns.contains(f.nameParts.last.toLowerCase) =>
      jsonContains(f.nameParts.last.toLowerCase, f.arguments)
    case a: UnresolvedAttribute
        if a.nameParts.length == 1 &&
          !RowColumns.contains(a.nameParts.head.toLowerCase) =>
      UnresolvedExtractValue(UnresolvedAttribute(Seq("meta")),
        Literal(a.nameParts.head))
  }

  // Milvus 2.4+ spells the same operators both ways — `array_contains`
  // is the documented alias of `json_contains` (and _any/_all likewise)
  private val JsonFns = Set(
    "json_contains", "json_contains_any", "json_contains_all",
    "array_contains", "array_contains_any", "array_contains_all")

  /** Milvus `json_contains(field, v)` / `_any` / `_all(field, [v…])`
    * over a JSON-valued meta string (the reference's own `tags` field is
    * JSON — `milvus-app/pythonvectordbceph_milvus.py:96`). The field
    * parses as a JSON array via `from_json(…, 'array<string>')` — each
    * element its raw text for scalars, its original JSON for nested
    * structures; a non-array or malformed value yields null and matches
    * nothing (Milvus likewise matches only array-valued paths).
    * Membership by element kind:
    *   - string literal → exact element match. NOTE the engine's
    *     metadata is stringly-typed, so `"5"` also matches the JSON
    *     number 5 (both canonicalize to the text `5`) — typed Milvus
    *     distinguishes them;
    *   - numeric literal → numeric comparison over `try_cast(element AS
    *     DOUBLE)` (`[1.0]` contains 1; non-numeric elements never match);
    *   - boolean literal → case-insensitive `true`/`false` text match;
    *   - nested ARRAY literal → whitespace-insensitive structural match:
    *     the element round-trips through from_json/to_json and compares
    *     against the literal's canonical JSON, so `[[1, 2]]` contains
    *     `[1,2]` — element TEXTS must agree (`[1.0,2]` does not match
    *     `[1,2]`; numeric normalization inside nested arrays is out of
    *     scope and documented here).
    * A nested path (`x["tags"]`) reads through `get_json_object`. */
  private def jsonContains(fn: String, args: Seq[Expression]): Expression = {
    import org.apache.spark.sql.functions.{array_contains, from_json, lit,
      lower, to_json}
    require(args.length == 2, s"$fn takes (field, value), got ${args.length}")
    val arr = from_json(jsonTarget(fn, args.head), ArrayType(StringType))
    def member(v: Expression): Column = v match {
      case Literal(s, StringType) if s != null =>
        array_contains(arr, s.toString)
      case l @ Literal(v2, t) if t.isInstanceOf[NumericType] && v2 != null =>
        val d = l.value match {
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case n: java.lang.Number => n.doubleValue
        }
        org.apache.spark.sql.functions.exists(arr, e =>
          GraftShim.column(Cast(GraftShim.expression(e), DoubleType, None,
            EvalMode.TRY)) === lit(d))
      case Literal(b, BooleanType) if b != null =>
        org.apache.spark.sql.functions.exists(arr,
          e => lower(e) === b.toString)
      case nested: UnresolvedFunction
          if nested.nameParts.last.equalsIgnoreCase("array") =>
        val canon = canonicalJsonArray(fn, nested.arguments)
        org.apache.spark.sql.functions.exists(arr, e =>
          to_json(from_json(e, ArrayType(StringType))) === lit(canon))
      case other => throw new IllegalArgumentException(
        s"$fn value must be a literal or a list of literals — got " +
          s"${other.sql}; if it is an unquoted string, quote it")
    }
    GraftShim.expression(fn.stripPrefix("json_").stripPrefix("array_") match {
      case "contains" => member(args(1))
      case suffix =>
        val elems = args(1) match {
          case a: UnresolvedFunction
              if a.nameParts.last.equalsIgnoreCase("array") => a.arguments
          case other => throw new IllegalArgumentException(
            s"$fn takes (field, [v1, v2, …]) — got ${other.sql}")
        }
        require(elems.nonEmpty, s"$fn needs a non-empty candidate list")
        val ms = elems.map(member)
        if (suffix == "contains_any") ms.reduce(_ || _) else ms.reduce(_ && _)
    })
  }

  // the JSON text column a json_contains field argument denotes: a meta
  // access directly; one level of path (`x["tags"]` → rewritten
  // meta['x']['tags']) via get_json_object over the OUTER json value —
  // string extraction has no native ExtractValue
  private def jsonTarget(fn: String, field: Expression): Column = field match {
    case e if isMetaAccess(e) => GraftShim.column(e)
    case UnresolvedExtractValue(inner, Literal(sub, StringType))
        if isMetaAccess(inner) && sub != null =>
      org.apache.spark.sql.functions.get_json_object(
        GraftShim.column(inner), s"$$.${sub.toString}")
    case other => throw new IllegalArgumentException(
      s"$fn's first argument must be a field (or field[\"subpath\"]), " +
        s"got ${other.sql}")
  }

  // canonical compact JSON of an array literal, driver-side — every
  // element rendered as a JSON string (matching the array<string> lens
  // the row side is parsed through)
  private def canonicalJsonArray(fn: String, elems: Seq[Expression]): String =
    elems.map {
      case Literal(s, StringType) if s != null =>
        "\"" + s.toString.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case l @ Literal(v, t) if t.isInstanceOf[NumericType] && v != null =>
        "\"" + l.value.toString + "\""
      case Literal(b, BooleanType) if b != null => "\"" + b.toString + "\""
      case UnresolvedExtractValue(_, Literal(k, StringType)) =>
        // a bare identifier the field rewrite turned into a meta access —
        // in value position that means missing quotes, same as rejectFieldToField
        throw new IllegalArgumentException(
          s"$fn: unquoted list element — if '$k' is a string VALUE, " +
            s"""quote it: ["$k", …]""")
      case other => throw new IllegalArgumentException(
        s"$fn: nested arrays may contain only scalar literals — got ${other.sql}")
    }.mkString("[", ",", "]")

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
