package graft.lucene

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CoreFunctions._

/** Resolved field: the Column plus enough type info to pick comparison
  * semantics (reference buildColumnExpressionFromField,
  * packages/common-utils/src/queryParser.ts:1620-1760).
  * `arrayElemField` set → `col` is an array of structs and predicates
  * apply existentially to element.field. */
final case class ResolvedField(col: Column, dataType: DataType,
    fromJsonString: Boolean = false,
    arrayElemField: Option[String] = None)

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

  def resolve(field0: String): Option[ResolvedField] = {
    val field = aliases.getOrElse(field0, field0)
    val mat = materialized.get(field)
      .flatMap(phys => byLower.get(phys.toLowerCase))
      .map(f => ResolvedField(col(f.name), f.dataType))
    mat.orElse(byLower.get(field.toLowerCase) match {
      case Some(f) if jsonStringColumns.contains(f.name) &&
          field.contains(".") =>
        None // handled by prefix path below (shouldn't happen: no dot here)
      case Some(f) => Some(ResolvedField(col(f.name), f.dataType))
      case None => resolvePath(field)
    })
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

  private def descend(f: StructField, path: Seq[String])
      : Option[ResolvedField] = f.dataType match {
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
    case MapType(_, vt, _) =>
      // Map['rest-of-path joined back'] — reference joins the remainder as a
      // single key (queryParser.ts:1685-1709)
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
      // queryParser.ts:1727-1739)
      val jsonPath = "$." + path.mkString(".")
      Some(ResolvedField(get_json_object(col(f.name), jsonPath), StringType,
        fromJsonString = true))
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
    case QNode.Not(x) => !compileNode(x, ctx, boundField)
    case QNode.Group(field, inner) => compileNode(inner, ctx, Some(field))
    case QNode.Term(fieldOpt, value) =>
      fieldOpt.orElse(boundField) match {
        case Some(field) => compileFieldTerm(field, value, ctx)
        case None => compileImplicitTerm(value, ctx)
      }
  }

  // ------------------------------------------------------- field-scoped

  private def compileFieldTerm(field: String, value: TermValue,
      ctx: LuceneContext): Column =
    ctx.resolver.resolve(field) match {
      case None => lit(false) // unknown field (NOT_FOUND_QUERY)
      case Some(rf) => compileTermOn(rf, value)
    }

  private def isNumericType(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  private def numericLit(v: String): Option[Double] =
    scala.util.Try(v.toDouble).toOption

  private def compileTermOn(rf: ResolvedField, value: TermValue): Column =
    rf.arrayElemField match {
      // array-of-structs: exists(arr, e -> <predicate on e.field>)
      case Some(field) =>
        exists(rf.col, e =>
          compileTermOn(ResolvedField(e.getField(field), rf.dataType),
            value))
      case None => compileScalarTermOn(rf, value)
    }

  private def compileScalarTermOn(rf: ResolvedField,
      value: TermValue): Column = {
    val c = rf.col
    value match {
      case TermValue.Exists =>
        // notEmpty(col) (reference isNotNull queryParser.ts:546-588)
        rf.dataType match {
          case _: ArrayType => c.isNotNull && size(c) > 0
          case _: MapType => c.isNotNull && size(c) > 0
          case StringType => notEmpty(c)
          case _ => c.isNotNull
        }

      case TermValue.Exact(v) => exactMatch(rf, v)

      case TermValue.Word(v) =>
        rf.dataType match {
          case dt if isNumericType(dt) =>
            numericLit(v) match {
              case Some(d) => c.cast("double") === lit(d)
              case None => lit(false)
            }
          case BooleanType => bool(v).map(b => c === lit(b)).getOrElse(lit(false))
          case _: ArrayType => arrayMatch(rf, v)
          case _ =>
            // unquoted word on an explicit field: contains / wildcard
            // (reference :1604-1608 ILIKE '%substr%'; wildcards :1468-1477)
            if (v.contains("*")) iLikeWildcard(c, v)
            else iContains(c, v)
        }

      case TermValue.Cmp(op, v) =>
        val (left, right) = comparisonSides(rf, v)
        op match {
          case ">" => left > right
          case ">=" => left >= right
          case "<" => left < right
          case "<=" => left <= right
        }

      case TermValue.Range(lo, hi, loIncl, hiIncl) =>
        val conds = Seq(
          lo.map { v =>
            val (l, r) = comparisonSides(rf, v)
            if (loIncl) l >= r else l > r
          },
          hi.map { v =>
            val (l, r) = comparisonSides(rf, v)
            if (hiIncl) l <= r else l < r
          }).flatten
        if (conds.isEmpty) c.isNotNull else conds.reduce(_ && _)
    }
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
      case _: ArrayType => arrayMatch(rf, v) // has(col, v)
      case _ => c === lit(v)
    }
  }

  /** Array columns: `has(col, v)` exact element match; numeric elements cast
    * (reference renderArrayFieldExpression queryParser.ts:821-908). */
  private def arrayMatch(rf: ResolvedField, v: String): Column = {
    val et = rf.dataType.asInstanceOf[ArrayType].elementType
    et match {
      case t if isNumericType(t) =>
        numericLit(v) match {
          case Some(d) => array_contains(rf.col.cast("array<double>"), d)
          case None => lit(false)
        }
      case MapType(_, _, _) =>
        // array-of-maps handled only with full path at resolve time; fall
        // back to false like the reference's unknown branch
        lit(false)
      case _ =>
        if (v.contains("*"))
          exists(rf.col, el => iLikeWildcard(el, v))
        else array_contains(rf.col, v)
    }
  }

  // ------------------------------------------------------- implicit field

  /** Free-text search on the implicit/body column (reference fieldSearch
    * queryParser.ts:1391-1608): every token must appear (hasToken AND …);
    * whole-term LIKE added when the term carries separators; wildcards →
    * ILIKE; quoted phrase → substring. */
  private def compileImplicitTerm(value: TermValue, ctx: LuceneContext)
      : Column = ctx.implicitColumn match {
    case None => lit(false)
    case Some(c) =>
      value match {
        case TermValue.Exists => notEmpty(c)
        case TermValue.Exact(v) => iContains(c, v)
        case TermValue.Word(v) if v.contains("*") =>
          // implicit-column wildcards are contains-style: the pattern is
          // wrapped in % on both sides (reference queryParser.ts:1468-1477
          // `lower(col) LIKE lower('%t%')`); bare-field wildcards (handled
          // in compileTermOn) stay prefix/suffix
          iLikeWildcard(c, "*" + v + "*")
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
