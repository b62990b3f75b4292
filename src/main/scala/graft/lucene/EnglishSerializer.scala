package graft.lucene

/** Prose explanation of a lucene query — the reference renders the same AST
  * with an English serializer for the UI
  * (packages/common-utils/src/queryParser.ts:205-416 EnglishSerializer,
  * :2175-2202 genEnglishExplanation). */
object EnglishSerializer {

  def explain(query: String): String =
    LuceneParser.parse(query) match {
      case None => "matches all events"
      case Some(ast) => node(ast, None)
    }

  private def node(n: QNode, bound: Option[String]): String = n match {
    case QNode.And(l, r) => s"${node(l, bound)} and ${node(r, bound)}"
    case QNode.Or(l, r) => s"(${node(l, bound)} or ${node(r, bound)})"
    case QNode.Not(x) => s"not (${node(x, bound)})"
    case QNode.Group(f, inner) => node(inner, Some(f))
    case QNode.Term(f, v) =>
      val field = f.orElse(bound)
      term(field, v)
  }

  private def term(field: Option[String], v: TermValue): String = {
    val subject = field.map(f => s"'$f'").getOrElse("the event")
    v match {
      case TermValue.Exists => s"$subject is present"
      case TermValue.Exact(s) => field match {
        case Some(_) => s"$subject equals '$s'"
        case None => s"the event contains the phrase '$s'"
      }
      case TermValue.Word(s) if s.contains("*") =>
        s"$subject matches the pattern '$s'"
      case TermValue.Word(s) => field match {
        case Some(_) => s"$subject contains '$s'"
        case None => s"the event contains '$s'"
      }
      case TermValue.Cmp(op, s) =>
        val rel = op match {
          case ">" => "is greater than"
          case ">=" => "is at least"
          case "<" => "is less than"
          case "<=" => "is at most"
        }
        s"$subject $rel $s"
      case TermValue.Range(lo, hi, loIncl, hiIncl) =>
        (lo, hi) match {
          case (Some(a), Some(b)) =>
            val left = if (loIncl) "inclusive" else "exclusive"
            val right = if (hiIncl) "inclusive" else "exclusive"
            s"$subject is between $a ($left) and $b ($right)"
          case (Some(a), None) => s"$subject is at least $a"
          case (None, Some(b)) => s"$subject is at most $b"
          case (None, None) => s"$subject is present"
        }
    }
  }
}
