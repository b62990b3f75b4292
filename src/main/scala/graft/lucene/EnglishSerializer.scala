package graft.lucene

/** Prose explanation of a lucene query — the reference renders the same
  * AST with an English serializer for the UI
  * (packages/common-utils/src/queryParser.ts:205-416 EnglishSerializer,
  * :2175-2202 genEnglishExplanation). Wording mirrors the reference's
  * test battery: "event has whole word foo" for implicit token search,
  * "'f' contains bar" / "'f' is bar" (quoted = exact) for fields,
  * "starts with"/"ends with"/"contains" for edge wildcards, "is between
  * 1 and 5 (exclusive)" for ranges, "is not null" for existence, and the
  * array phrasings ("contains an element containing foo", "contains an
  * element with key k and value v") when a [[FieldResolver]] is supplied
  * to type the field. Negation spelled with the `-`/`!` prefix renders
  * inline ("does not contain", "is not", "is null") — the reference's
  * isNegatedField path; negation spelled with the NOT keyword emits
  * the keyword verbatim over the positive rendering ("NOT 'f' contains
  * x"), like the reference serializing the parser's `start` token;
  * keyword negation of anything compound renders as `NOT (...)`. */
object EnglishSerializer {

  def explain(query: String): String = explain(query, None)

  def explain(query: String, resolver: Option[FieldResolver]): String =
    LuceneParser.parse(query) match {
      case None => "matches all events"
      case Some(ast) => node(ast, None, resolver)
    }

  private def node(n: QNode, bound: Option[String],
      res: Option[FieldResolver]): String = n match {
    case QNode.And(l, r) =>
      s"${node(l, bound, res)} AND ${node(r, bound, res)}"
    case QNode.Or(l, r) =>
      s"${node(l, bound, res)} OR ${node(r, bound, res)}"
    // in-group semantics apply only to terms that INHERIT the group's
    // field (f = None) — a term with its own field keeps top-level
    // semantics in the compiler (LuceneCompiler.compileNode), and the
    // explanation must describe the predicate that actually runs
    // only -/! PREFIX negation renders inline ("does not contain") —
    // the reference's isNegatedField path (queryParser.ts:283-296);
    // the NOT-keyword spelling emits the keyword verbatim over the
    // POSITIVE rendering, like the reference serializing the parser's
    // `start` token (queryParser.ts:2098-2112)
    case QNode.Not(QNode.Term(f, v), false) =>
      term(f.orElse(bound), v, negated = true,
        inGroup = f.isEmpty && bound.isDefined, res)
    case QNode.Not(t @ QNode.Term(_, _), true) =>
      s"NOT ${node(t, bound, res)}"
    case QNode.Not(x, _) => s"NOT (${node(x, bound, res)})"
    case QNode.Group(f, inner) => s"(${node(inner, Some(f), res)})"
    case QNode.Term(f, v) =>
      term(f.orElse(bound), v, negated = false,
        inGroup = f.isEmpty && bound.isDefined, res)
  }

  /** Array element info when the resolver types the field as an array:
    * Some(mapKey) for array-of-maps paths, Some(structField) for
    * array-of-structs, None key for plain arrays. */
  private def arrayInfo(field: String, res: Option[FieldResolver])
      : Option[Option[String]] =
    res.flatMap(_.resolve(field)).flatMap { rf =>
      rf.arrayElemMapKey.orElse(rf.arrayElemField) match {
        case some @ Some(_) => Some(some)
        case None => rf.dataType match {
          case _: org.apache.spark.sql.types.ArrayType => Some(None)
          case _ => None
        }
      }
    }

  private def term(field: Option[String], v: TermValue, negated: Boolean,
      inGroup: Boolean, res: Option[FieldResolver]): String = {
    // in-group subjects render bare (reference: "(ServiceName contains
    // abc)"), top-level subjects quoted ("'ServiceName' contains abc")
    def subject(f: String): String = if (inGroup) f else s"'$f'"
    field match {
      case None => implicitTerm(v, negated)
      case Some(f) =>
        val arr = arrayInfo(f, res)
        v match {
          case TermValue.Exists => arr match {
            case Some(Some(k)) =>
              val base = f.stripSuffix("." + k)
              s"${subject(base)} ${if (negated) "does not contain"
                else "contains"} an element with non-null $k"
            case _ =>
              s"${subject(f)} is ${if (negated) "" else "not "}null"
          }
          case TermValue.Exact(s) => arr match {
            // quoted array terms keep the dotted path as subject — the
            // reference's own phrasing ("'Events.Attributes.message'
            // contains key1" for the quoted form, element-with-key
            // phrasing only for the unquoted form)
            case Some(_) =>
              s"${subject(f)} ${neg(negated, "contains")} $s"
            case None =>
              if (inGroup) // group phrase = contains, quoted render
                s"""${subject(f)} ${neg(negated, "contains")} "$s""""
              else s"${subject(f)} is ${if (negated) "not " else ""}$s"
          }
          case TermValue.Word(s) =>
            val (t, prefix, suffix) = stripStars(s)
            arr match {
              case Some(Some(k)) =>
                val base = f.stripSuffix("." + k)
                s"${subject(base)} ${neg(negated, "contains")} an " +
                  s"element with key $k and value $t"
              case Some(None) =>
                s"${subject(f)} ${neg(negated, "contains")} an element " +
                  s"containing $t"
              case None =>
                val rel =
                  if (inGroup && prefix && !suffix) "ends with"
                  else if (inGroup && suffix && !prefix) "starts with"
                  else "contains"
                s"${subject(f)} ${neg(negated, rel)} $t"
            }
          case TermValue.Cmp(op, s) =>
            val rel = op match {
              case ">" => "greater than"
              case ">=" => "greater than or equal to"
              case "<" => "less than"
              case "<=" => "less than or equal to"
            }
            s"${subject(f)} is ${if (negated) "not " else ""}$rel $s"
          case TermValue.Range(lo, hi, loIncl, hiIncl) =>
            (lo, hi) match {
              case (Some(a), Some(b)) =>
                // reference: range subjects render unquoted, exclusive
                // bounds annotated ("Duration is between 100 (exclusive)
                // and 500 (exclusive)")
                val left = if (loIncl) a else s"$a (exclusive)"
                val right = if (hiIncl) b else s"$b (exclusive)"
                s"$f is ${if (negated) "not " else ""}between $left " +
                  s"and $right"
              case (Some(a), None) =>
                s"$f is ${if (negated) "not " else ""}at least $a"
              case (None, Some(b)) =>
                s"$f is ${if (negated) "not " else ""}at most $b"
              case (None, None) =>
                s"${subject(f)} is ${if (negated) "" else "not "}null"
            }
        }
    }
  }

  private def implicitTerm(v: TermValue, negated: Boolean): String =
    v match {
      case TermValue.Exists => s"event is ${if (negated) "" else "not "}empty"
      case TermValue.Exact(s) =>
        s"""event ${neg(negated, "has whole word")} "$s""""
      case TermValue.Word(s) =>
        val (t, prefix, suffix) = stripStars(s)
        val quoted = if (t.trim.exists(_.isWhitespace)) s""""$t"""" else t
        val rel =
          if (prefix && suffix) "contains"
          else if (prefix) "ends with"
          else if (suffix) "starts with"
          else "has whole word"
        s"event ${neg(negated, rel)} $quoted"
      case TermValue.Cmp(op, s) => s"event $op $s" // not expressible
      case TermValue.Range(_, _, _, _) => "event range (not expressible)"
    }

  /** "contains" → "does not contain", "has whole word" → "does not have
    * whole word", "starts with" → "does not start with" (the reference's
    * negated phrasings). */
  private def neg(negated: Boolean, rel: String): String =
    if (!negated) rel
    else rel match {
      case "contains" => "does not contain"
      case "has whole word" => "does not have whole word"
      case "starts with" => "does not start with"
      case "ends with" => "does not end with"
      case other => s"does not $other"
    }

  /** The compiler's own edge-star split — the explanation must
    * describe wildcards with exactly the compiled semantics. */
  private def stripStars(s: String): (String, Boolean, Boolean) =
    LuceneCompiler.stripEdgeStars(s)
}
