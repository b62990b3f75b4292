package graft.lucene

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CoreFunctions._

/** Resolved field: the Column plus enough type info to pick comparison
  * semantics (reference buildColumnExpressionFromField,
  * packages/common-utils/src/queryParser.ts:1620-1760).
  * `arrayElemField` set → `col` is an array of structs and predicates
  * apply existentially to element.field; `arrayElemMapKey` set → `col`
  * is an array of maps and predicates apply existentially to
  * element[key] (reference Array(Map(String,String)) dispatch,
  * queryParser.ts:821-908 — the path remainder joins back into one
  * key, `Events.Attributes.message.subkey` → el['message.subkey']). */
final case class ResolvedField(col: Column, dataType: DataType,
    fromJsonString: Boolean = false,
    arrayElemField: Option[String] = None,
    arrayElemMapKey: Option[String] = None)

/** Schema-driven field resolution: exact column name, else dot-path prefix
  * match into Map / Struct / JSON-string / Array columns (reference
  * findPrefixMatch queryParser.ts:126-155). Unknown fields yield None →
  * compiled to `lit(false)` (NOT_FOUND_QUERY, queryParser.ts:419). */
final class FieldResolver(schema: StructType,
    /** columns holding JSON-encoded strings (dot-paths descend via
      * get_json_object), e.g. events.props. */
    jsonStringColumns: Set[String] = Set.empty,
    /** semantic aliases, e.g. "level" -> "SeverityText". */
    aliases: Map[String, String] = Map.empty,
    /** logical path → physical materialized column; takes precedence over
      * map/JSON descent (reference fastifySQL substitution,
      * renderChartConfig.ts:209-341) — the physical column carries stats
      * and pushes down, `element_at` does not. */
    materialized: Map[String, String] = Map.empty) {

  private val byLower: Map[String, StructField] =
    schema.fields.map(f => f.name.toLowerCase -> f).toMap

  /** `Col['key']` / `Col["key"]` bracket notation (reference
    * parseKeyPath, core/metadata.ts; tested metadata.test.ts:2984-3020):
    * the key is ONE map key verbatim — dots inside it do not re-split.
    * Incomplete brackets fall through to plain resolution. */
  private val BracketPath =
    """^([A-Za-z0-9_.]+)\[(?:'([^']*)'|"([^"]*)")\]$""".r

  def resolve(field0: String): Option[ResolvedField] = {
    val field = aliases.getOrElse(field0, field0)
    // normalize DOT-FREE bracket spellings to the dot form for the
    // materialized lookup: Col['k'] and Col.k are the SAME logical field
    // and must hit the same physical column (stats + pushdown), not
    // diverge by syntax. A key CONTAINING dots canonicalizes to the
    // single-quote bracket form instead — Col['a.b'] is a different
    // logical field from the genuinely nested Col.a.b, and collapsing
    // both to "Col.a.b" would serve one's materialized column for the
    // other; register dotted-key materializations under "Col['a.b']"
    val matKey = field match {
      case BracketPath(base, sq, dq) =>
        val key = if (sq != null) sq else dq
        if (key.contains(".")) s"$base['$key']" else s"$base.$key"
      case other => other
    }
    val mat = materialized.get(matKey)
      .flatMap(phys => byLower.get(phys.toLowerCase))
      .map(f => ResolvedField(col(f.name), f.dataType))
    mat.orElse(field match {
      case BracketPath(base, sq, dq) =>
        val key = if (sq != null) sq else dq
        byLower.get(base.toLowerCase)
          .flatMap(f => descend(f, Seq(key), verbatimKey = true))
          // a DOTTED base (Struct.nested['k']) misses the physical-
          // column lookup above: resolve the base like any dot path,
          // then apply the verbatim bracket key at the end
          .orElse(resolveBracketPath(base, key))
      case _ => byLower.get(field.toLowerCase) match {
        case Some(f) if jsonStringColumns.contains(f.name) &&
            field.contains(".") =>
          None // handled by prefix path below (shouldn't happen: no dot)
        case Some(f) => Some(ResolvedField(col(f.name), f.dataType))
        case None => resolvePath(field)
      }
    })
  }

  /** Bracket notation behind a DOTTED base: longest-prefix match the
    * base against physical columns, walk the remainder through struct
    * levels, then apply the verbatim bracket key to the terminal
    * container (map lookup / struct field / JSON-string extraction).
    * Struct-only mid-path walking is deliberate: a map or JSON segment
    * would swallow the remainder into its own key, which the bracket
    * spelling explicitly separates. */
  private def resolveBracketPath(base: String, key: String)
      : Option[ResolvedField] = {
    val parts = base.split('.')
    (parts.length to 1 by -1).iterator.flatMap { n =>
      val prefix = parts.take(n).mkString(".")
      val rest = parts.drop(n).toSeq
      byLower.get(prefix.toLowerCase).flatMap(f =>
        descendBracket(f, rest, key))
    }.nextOption()
  }

  private def descendBracket(f: StructField, rest: Seq[String],
      key: String): Option[ResolvedField] = {
    if (jsonStringColumns.contains(f.name)) {
      // JSON-string column: $.rest['key'] — the bracket form keeps the
      // key verbatim where the dot form would re-split it
      val jsonPath = "$" +
        (if (rest.nonEmpty) "." + rest.mkString(".") else "") +
        "['" + key.replace("'", "\\'") + "']"
      return Some(ResolvedField(
        coalesce(get_json_object(col(f.name), jsonPath), lit("")),
        StringType, fromJsonString = true))
    }
    var cur: Column = col(f.name)
    var curType: DataType = f.dataType
    var ok = true
    rest.foreach { p =>
      curType match {
        case s: StructType =>
          s.fields.find(_.name.equalsIgnoreCase(p)) match {
            case Some(sf) =>
              cur = cur.getField(sf.name); curType = sf.dataType
            case None => ok = false
          }
        case _ => ok = false
      }
    }
    if (!ok) None
    else curType match {
      case MapType(_, StringType, _) =>
        // missing key reads as '' — the Map branch's ClickHouse
        // default-value contract
        Some(ResolvedField(coalesce(element_at(cur, key), lit("")),
          StringType))
      case MapType(_, vt, _) =>
        Some(ResolvedField(element_at(cur, key), vt))
      case s: StructType =>
        s.fields.find(_.name.equalsIgnoreCase(key)).map(sf =>
          ResolvedField(cur.getField(sf.name), sf.dataType))
      case _ => None
    }
  }

  /** Longest-prefix match of a dot path against real columns. */
  private def resolvePath(field: String): Option[ResolvedField] = {
    val parts = field.split('.')
    // try longest prefix first, length-1 minimum
    (parts.length - 1 to 1 by -1).iterator.flatMap { n =>
      val prefix = parts.take(n).mkString(".")
      val rest = parts.drop(n)
      byLower.get(prefix.toLowerCase).flatMap(f => descend(f, rest))
    }.nextOption()
  }

  private def descend(f: StructField, path: Seq[String],
      verbatimKey: Boolean = false): Option[ResolvedField] =
    f.dataType match {
    case ArrayType(st: StructType, _) if path.nonEmpty =>
      // array-of-structs (OTel Events.Name / Links.* nesting): resolve the
      // field against the element struct; match semantics become
      // exists(col, e -> pred(e.field)) via ArrayElemField (reference
      // arrayExists over nested arrays, queryParser.ts:821-908)
      st.fields.find(_.name.equalsIgnoreCase(path.head)).flatMap { sf =>
        if (path.length == 1)
          Some(ResolvedField(col(f.name), sf.dataType,
            arrayElemField = Some(sf.name)))
        else None // deeper nesting not supported (matches reference)
      }
    case ArrayType(MapType(_, vt, _), _) if path.nonEmpty =>
      // array-of-maps (OTel Events.Attributes): existential el[key] match
      // with the path remainder joined back into a single key (reference
      // arrayExists(el -> el['message.subkey'] …), queryParser.ts:854-871)
      Some(ResolvedField(col(f.name), vt,
        arrayElemMapKey = Some(path.mkString("."))))
    case MapType(_, StringType, _) =>
      // Map['rest-of-path joined back'] — reference joins the remainder as
      // a single key (queryParser.ts:1685-1709). A missing key reads as ''
      // (ClickHouse Map default-value semantics): negated predicates and
      // empty-string equality then MATCH rows without the key, exactly as
      // the reference's `map['k'] != 'v'` / missing-key tests pin
      // (queryParser.test.ts:2596-2619).
      Some(ResolvedField(
        coalesce(element_at(col(f.name), path.mkString(".")), lit("")),
        StringType))
    case MapType(_, vt, _) =>
      // typed map values keep SQL null semantics (no portable default)
      Some(ResolvedField(element_at(col(f.name), path.mkString(".")), vt))
    case st: StructType =>
      // walk struct fields
      var cur: Column = col(f.name)
      var curType: DataType = st
      var ok = true
      path.foreach { p =>
        curType match {
          case s: StructType =>
            s.fields.find(_.name.equalsIgnoreCase(p)) match {
              case Some(sf) => cur = cur.getField(sf.name); curType = sf.dataType
              case None => ok = false
            }
          case _ => ok = false
        }
      }
      if (ok) Some(ResolvedField(cur, curType)) else None
    case StringType if jsonStringColumns.contains(f.name) =>
      // JSON-string path → get_json_object (reference JSONExtractString,
      // queryParser.ts:1727-1739). Missing path reads as '' — ClickHouse
      // JSONExtractString returns the type default, so negations and
      // empty-string equality match rows without the key (same contract
      // as the Map branch above). A bracket-resolved key is ONE field
      // name even with dots inside — JsonPath's bracket form keeps it
      // verbatim where the dot form would re-split it
      val jsonPath =
        if (verbatimKey) "$['" + path.mkString(".").replace("'", "\\'") + "']"
        else "$." + path.mkString(".")
      Some(ResolvedField(
        coalesce(get_json_object(col(f.name), jsonPath), lit("")),
        StringType, fromJsonString = true))
    case ArrayType(et, _) if path.isEmpty =>
      Some(ResolvedField(col(f.name), f.dataType))
    case _ => None
  }
}

/** Compilation context: the resolver + the implicit (free-text/body) column
  * (reference getColumnForField queryParser.ts:1873-1934 — multi-column
  * implicit fields should be pre-combined with concat_ws(";", …)). */
final case class LuceneContext(resolver: FieldResolver,
    implicitColumn: Option[Column])

/** Lucene AST → Spark Column predicate compiler. Semantics mirror the
  * reference's SQL serializer (queryParser.ts:457-783, 1391-1608). */
object LuceneCompiler {

  def compile(query: String, ctx: LuceneContext): Column =
    LuceneParser.parse(query) match {
      case None => lit(true)
      case Some(ast) => compileNode(ast, ctx, None)
    }

  private def compileNode(n: QNode, ctx: LuceneContext,
      boundField: Option[String]): Column = n match {
    case QNode.And(l, r) =>
      compileNode(l, ctx, boundField) && compileNode(r, ctx, boundField)
    case QNode.Or(l, r) =>
      compileNode(l, ctx, boundField) || compileNode(r, ctx, boundField)
    case QNode.Not(x, _) => !compileNode(x, ctx, boundField)
    case QNode.Group(field, inner) => compileNode(inner, ctx, Some(field))
    case QNode.Term(fieldOpt, value) =>
      (fieldOpt, boundField) match {
        // a term with its OWN field keeps top-level semantics even inside
        // a group — `foo:(bar:(baz) qux)` binds baz to bar, qux to foo
        case (Some(field), _) => compileFieldTerm(field, value, ctx,
          inGroup = false)
        // a bare term inside `foo:(...)` — the group REBINDS the implicit
        // field to foo, and the term takes IMPLICIT-STYLE semantics on
        // that column (reference createSerializerContext,
        // queryParser.ts:2035-2060 + fieldSearch's implicit branch):
        // quoted phrases become CONTAINS (never exact-eq —
        // `ServiceName:("foo bar")` is ILIKE '%foo bar%' while
        // `ServiceName:"foo bar"` is equality), and edge wildcards are
        // honored (`foo:(bar*)` starts-with, where top-level `foo:bar*`
        // collapses to contains)
        case (None, Some(field)) => compileFieldTerm(field, value, ctx,
          inGroup = true)
        case (None, None) => compileImplicitTerm(value, ctx)
      }
  }

  // ------------------------------------------------------- field-scoped

  private def compileFieldTerm(field: String, value: TermValue,
      ctx: LuceneContext, inGroup: Boolean): Column =
    ctx.resolver.resolve(field) match {
      case None => lit(false) // unknown field (NOT_FOUND_QUERY)
      case Some(rf) => compileTermOn(rf, value, inGroup)
    }

  private def isNumericType(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  private def numericLit(v: String): Option[Double] =
    scala.util.Try(v.toDouble).toOption

  private def compileTermOn(rf: ResolvedField, value: TermValue,
      inGroup: Boolean): Column =
    rf.arrayElemField match {
      // array-of-structs: exists(arr, e -> <predicate on e.field>)
      case Some(field) =>
        exists(rf.col, e =>
          compileScalarTermOn(
            ResolvedField(e.getField(field), rf.dataType), value, inGroup))
      case None => rf.arrayElemMapKey match {
        // array-of-maps: exists(arr, e -> <predicate on e[key]>), missing
        // key reading as '' (the Map-branch default-value contract)
        case Some(key) =>
          exists(rf.col, e => {
            val elem =
              if (rf.dataType == StringType)
                coalesce(element_at(e, key), lit(""))
              else element_at(e, key)
            compileScalarTermOn(ResolvedField(elem, rf.dataType), value,
              inGroup)
          })
        case None => compileScalarTermOn(rf, value, inGroup)
      }
    }

  private def compileScalarTermOn(rf: ResolvedField,
      value: TermValue, inGroup: Boolean): Column = {
    val c = rf.col
    value match {
      case TermValue.Exists => existsMatch(rf)

      // quoted term: exact at top level, CONTAINS inside a group (the
      // reference's implicit-branch dispatch — nodeTerm only routes to
      // eq() when the node's own field is explicit, queryParser.ts:1963).
      // Quoting makes the phrase LITERAL: an asterisk inside quotes is a
      // character, never a wildcard (the reference escapes the quoted
      // phrase straight into ILIKE '%literal%')
      case TermValue.Exact(v) =>
        if (inGroup) wordMatch(rf, v, honorEdgeWildcards = false,
          literal = true)
        else exactMatch(rf, v)

      case TermValue.Word(v) =>
        // edge wildcards are honored only in group position; a top-level
        // `foo:*bar` strips them and collapses to contains (reference
        // nodeTerm strips prefix/suffix stars :1997-2006 and the explicit
        // ILIKE branch ignores the flags :1604-1608)
        wordMatch(rf, v, honorEdgeWildcards = inGroup, literal = false)

      case TermValue.Cmp(op, v) =>
        // reference rejects ordering comparisons on whole array columns
        // ('>= comparison is not supported for Array-type fields',
        // queryParser.ts:521-544) — loud beats a silently-false cast
        require(!rf.dataType.isInstanceOf[ArrayType],
          s"'$op' comparison is not supported for array fields")
        val (left, right) = comparisonSides(rf, v)
        op match {
          case ">" => left > right
          case ">=" => left >= right
          case "<" => left < right
          case "<=" => left <= right
        }

      case TermValue.Range(lo, hi, loIncl, hiIncl) =>
        require(!rf.dataType.isInstanceOf[ArrayType] ||
            (lo.isEmpty && hi.isEmpty),
          "range comparison is not supported for array fields")
        val conds = Seq(
          lo.map { v =>
            val (l, r) = comparisonSides(rf, v)
            if (loIncl) l >= r else l > r
          },
          hi.map { v =>
            val (l, r) = comparisonSides(rf, v)
            if (hiIncl) l <= r else l < r
          }).flatten
        // `[* TO *]` ≡ existence (reference notEmpty, queryParser.test.ts
        // range case `ServiceName:[* TO *]`)
        if (conds.isEmpty) existsMatch(rf) else conds.reduce(_ && _)
    }
  }

  /** `field:*` / `field:[* TO *]` — notEmpty semantics
    * (reference isNotNull queryParser.ts:546-588). */
  private def existsMatch(rf: ResolvedField): Column = {
    val c = rf.col
    rf.dataType match {
      case _: ArrayType => c.isNotNull && size(c) > 0
      case _: MapType => c.isNotNull && size(c) > 0
      case StringType => notEmpty(c)
      case _ => c.isNotNull
    }
  }

  /** Unquoted-word semantics on an explicit or group-bound field:
    * numeric/bool → typed equality; arrays → existential ELEMENT
    * CONTAINS (reference arrayExists-ILIKE, exact `has()` only for
    * quoted terms); strings → contains, with edge wildcards honored in
    * group position (`%` only where the `*` was) and collapsed to
    * contains at top level. Interior `*` stays a wildcard — a
    * deliberate superset of the reference, which matches interior
    * asterisks literally (real Lucene semantics; documented in
    * LuceneSpec). */
  private def wordMatch(rf: ResolvedField, v: String,
      honorEdgeWildcards: Boolean, literal: Boolean): Column = {
    val c = rf.col
    rf.dataType match {
      case dt if isNumericType(dt) =>
        numericLit(if (literal) v else stripEdgeStars(v)._1) match {
          case Some(d) => c.cast("double") === lit(d)
          case None => lit(false)
        }
      case BooleanType =>
        bool(v).map(b => c === lit(b)).getOrElse(lit(false))
      case at: ArrayType => arrayWordMatch(rf, at, v, literal)
      case _ if literal => iContains(c, v) // quoted: every char literal
      case _ =>
        val (term, prefix, suffix) = stripEdgeStars(v)
        // all-stars term (`**`): same existence semantics as bare `*`
        // (only exactly "*" parses to Exists upstream)
        if (term.isEmpty) existsMatch(rf)
        else if (honorEdgeWildcards && (prefix || suffix))
          iLikeEdges(c, term, prefix, suffix)
        else iLikeEdges(c, term, prefixWildcard = true,
          suffixWildcard = true) // contains
    }
  }

  /** Strip leading/trailing `*` into (term, prefixWildcard,
    * suffixWildcard) — reference nodeTerm queryParser.ts:1997-2006.
    * Package-private: the English serializer must describe wildcards
    * with EXACTLY this split or the UI text diverges from the
    * compiled predicate. */
  private[lucene] def stripEdgeStars(v: String): (String, Boolean, Boolean) = {
    var t = v
    val prefix = t.startsWith("*")
    if (prefix) t = t.drop(1)
    val suffix = t.endsWith("*")
    if (suffix) t = t.dropLast
    (t, prefix, suffix)
  }

  private implicit class StrOps(private val s: String) {
    def dropLast: String = if (s.isEmpty) s else s.substring(0, s.length - 1)
  }

  /** `lower(col) LIKE lower(pattern)` with `%` only at the flagged edges
    * (reference fieldSearch wildcard branch, queryParser.ts:1468-1477);
    * interior `*` becomes `%` (documented superset), LIKE metachars in
    * the literal parts escaped. */
  private def iLikeEdges(c: Column, term: String, prefixWildcard: Boolean,
      suffixWildcard: Boolean): Column = {
    val body = term
      .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      .replace("*", "%")
    val pattern = (if (prefixWildcard) "%" else "") + body +
      (if (suffixWildcard) "%" else "")
    lower(c).like(pattern.toLowerCase)
  }

  /** Pick comparison representation: numeric column → numeric compare;
    * string column with numeric literal → cast column to double (JSON
    * numeric-path guard analogue, queryParser.ts:1718-1724); else lexical. */
  private def comparisonSides(rf: ResolvedField, v: String): (Column, Column) =
    rf.dataType match {
      case dt if isNumericType(dt) => (rf.col, lit(v.toDouble))
      case DateType | TimestampType => (rf.col, to_timestamp(lit(v)))
      case _ =>
        numericLit(v) match {
          case Some(d) => (rf.col.cast("double"), lit(d))
          case None => (rf.col, lit(v))
        }
    }

  private def bool(v: String): Option[Boolean] = v.toLowerCase match {
    case "true" | "1" => Some(true)
    case "false" | "0" => Some(false)
    case _ => None
  }

  /** Quoted exact match (reference eq queryParser.ts:457-544). */
  private def exactMatch(rf: ResolvedField, v: String): Column = {
    val c = rf.col
    rf.dataType match {
      case dt if isNumericType(dt) =>
        numericLit(v) match {
          case Some(d) => c.cast("double") === lit(d)
          case None => lit(false)
        }
      case BooleanType => bool(v).map(b => c === lit(b)).getOrElse(lit(false))
      case at: ArrayType => exactArrayMatch(rf, at, v) // has(col, v)
      case _ => c === lit(v)
    }
  }

  /** Quoted term on an array column: `has(col, v)` exact element match;
    * numeric/bool elements typed, other non-string elements compare by
    * their string rendering (reference `has(...)` / `arrayExists(el ->
    * toString(el) = v)` dispatch, queryParser.ts:821-908). */
  private def exactArrayMatch(rf: ResolvedField, at: ArrayType,
      v: String): Column = at.elementType match {
    case t if isNumericType(t) =>
      numericLit(v) match {
        case Some(d) => array_contains(rf.col.cast("array<double>"), d)
        case None => lit(false)
      }
    case BooleanType =>
      bool(v).map(b => array_contains(rf.col, b)).getOrElse(lit(false))
    case MapType(_, _, _) =>
      // array-of-maps requires a key path (resolved upstream); bare
      // match falls to false like the reference's unknown branch
      lit(false)
    case StringType => array_contains(rf.col, v)
    case _ => exists(rf.col, el => el.cast("string") === lit(v))
  }

  /** Unquoted term on an array column: existential ELEMENT CONTAINS for
    * string-ish elements — `Events.Name:foo` is `arrayExists(el -> el
    * ILIKE '%foo%')`, NOT exact `has()` (reference
    * queryParser.test.ts:2060-2075); edge wildcards collapse to
    * contains there too. Numeric/bool elements stay typed-equality. */
  private def arrayWordMatch(rf: ResolvedField, at: ArrayType,
      v: String, literal: Boolean): Column = at.elementType match {
    case t if isNumericType(t) =>
      numericLit(if (literal) v else stripEdgeStars(v)._1) match {
        case Some(d) => array_contains(rf.col.cast("array<double>"), d)
        case None => lit(false)
      }
    case BooleanType =>
      bool(v).map(b => array_contains(rf.col, b)).getOrElse(lit(false))
    case MapType(_, _, _) => lit(false)
    case et =>
      val elemStr: Column => Column =
        if (et == StringType) identity else _.cast("string")
      if (literal) // quoted-in-group: element contains, stars literal
        exists(rf.col, el => iContains(elemStr(el), v))
      else {
        val (term, _, _) = stripEdgeStars(v)
        if (term.isEmpty) existsMatch(rf)
        else exists(rf.col, el => iLikeEdges(elemStr(el), term,
          prefixWildcard = true, suffixWildcard = true))
      }
  }

  // ------------------------------------------------------- implicit field

  /** Free-text search on the implicit/body column (reference fieldSearch
    * queryParser.ts:1391-1608): every token must appear (hasToken AND …);
    * whole-term LIKE added when the term carries separators; wildcards →
    * ILIKE; quoted phrase → substring. */
  private def compileImplicitTerm(value: TermValue, ctx: LuceneContext)
      : Column = ctx.implicitColumn match {
    case None => throw new IllegalArgumentException(
      // the reference throws the same way (queryParser.ts:1881-1884)
      // rather than silently matching nothing
      "Can not search bare text without an implicit column set.")
    case Some(c) =>
      value match {
        case TermValue.Exists => notEmpty(c)
        case TermValue.Exact(v) => iContains(c, v)
        case TermValue.Word(v) if v.contains("*") =>
          // edge wildcards anchor: `*bar` is ends-with, `bar*` is
          // starts-with — `%` appears ONLY where the `*` was (reference
          // fieldSearch queryParser.ts:1468-1477). A term with interior
          // stars only (`time*ut`) matches contains-style with the
          // interior star as a wildcard — a documented superset of the
          // reference, which routes such terms to token search with the
          // asterisk literal
          val (term, prefix, suffix) = stripEdgeStars(v)
          if (term.isEmpty) notEmpty(c)
          else if (prefix || suffix) iLikeEdges(c, term, prefix, suffix)
          else iLikeEdges(c, term, prefixWildcard = true,
            suffixWildcard = true)
        case TermValue.Word(v) =>
          val tokens = tokenizeTerm(v)
          val tokenMatch =
            if (tokens.isEmpty) lit(true)
            else tokens.map(t => hasToken(c, t)).reduce(_ && _)
          // separators present → also require the full phrase
          // (queryParser.ts:1579-1600)
          if (tokens.length > 1 || tokens.mkString != v.toLowerCase)
            tokenMatch && iContains(c, v)
          else tokenMatch
        case TermValue.Cmp(_, _) | TermValue.Range(_, _, _, _) =>
          lit(false) // comparisons require a field
      }
  }
}
