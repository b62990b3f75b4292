package graft.lucene

/** Lucene-style search language: AST + recursive-descent parser.
  *
  * Grammar follows the reference's `@hyperdx/lucene` surface as exercised by
  * its serializer (packages/common-utils/src/queryParser.ts:435-454 operators;
  * :1937-2033 term dispatch; :2035-2060 field-scoped groups):
  *
  *   expr    := or
  *   or      := and (("OR" ["NOT"]) and)*
  *   and     := unary (["AND" ["NOT"]] unary)*      -- implicit AND
  *   unary   := ("NOT" | "-") unary | primary
  *   primary := "(" expr ")" | field ":" value | term
  *   value   := quoted | "(" expr ")"               -- field-scoped group
  *            | "[" t "TO" t "]" | "{" t "TO" t "}" -- ranges (mixed allowed)
  *            | (">="|"<="|">"|"<") term | "*" | term
  */
sealed trait QNode
object QNode {
  final case class And(l: QNode, r: QNode) extends QNode
  final case class Or(l: QNode, r: QNode) extends QNode
  /** `keyword`: the negation was spelled `NOT` / `AND NOT` / `OR NOT`
    * rather than the `-`/`!` prefix. Compiled predicates are identical;
    * the English serializer mirrors the reference, which emits the
    * keyword form as a verbatim `NOT ` prefix (the parser's `start`
    * token, queryParser.ts:2098-2112) and renders only the -prefix
    * form inline ("does not contain"). */
  final case class Not(n: QNode, keyword: Boolean = false) extends QNode
  /** field=None → the implicit (body) column. */
  final case class Term(field: Option[String], value: TermValue) extends QNode
  /** `foo:(a b)` — rebinds the implicit field inside the group
    * (reference createSerializerContext queryParser.ts:2035-2055). */
  final case class Group(field: String, inner: QNode) extends QNode
}

sealed trait TermValue
object TermValue {
  /** Quoted "exact" term. */
  final case class Exact(v: String) extends TermValue
  /** Bare word; may contain `*` wildcards. */
  final case class Word(v: String) extends TermValue
  /** `field:*` → existence. */
  case object Exists extends TermValue
  /** `field:>n` etc. op ∈ {>, >=, <, <=}. */
  final case class Cmp(op: String, v: String) extends TermValue
  /** `[a TO b]` / `{a TO b}`; None bound = `*` (unbounded). */
  final case class Range(lo: Option[String], hi: Option[String],
      loIncl: Boolean, hiIncl: Boolean) extends TermValue
}

final class LuceneParseException(msg: String) extends Exception(msg)

object LuceneParser {

  /** Parse a query; empty/blank input → None. Special tokens (URLs,
    * `localhost:port`, escaped colons/backslashes) are encoded before the
    * grammar runs and decoded out of the AST after, so
    * `url:https://x.com/path` parses without quoting — the reference's
    * encode/decode pre-pass (queryParser.ts:32-48). */
  def parse(input: String): Option[QNode] = {
    val trimmed = input.trim
    if (trimmed.isEmpty) None
    else Some(decodeNode(new P(encodeSpecialTokens(trimmed)).parseAll()))
  }

  private[lucene] def encodeSpecialTokens(q: String): String = q
    .replace("\\\\", "HDX_BACKSLASH_LITERAL")
    .replace("http://", "http_COLON_//")
    .replace("https://", "https_COLON_//")
    .replaceAll("localhost:(\\d{1,5})", "localhost_COLON_$1")
    .replace("\\:", "HDX_COLON")

  private[lucene] def decodeSpecialTokens(v: String): String = v
    .replace("\\\"", "\"")
    .replace("HDX_BACKSLASH_LITERAL", "\\")
    .replace("http_COLON_//", "http://")
    .replace("https_COLON_//", "https://")
    .replaceAll("localhost_COLON_(\\d{1,5})", "localhost:$1")
    .replace("HDX_COLON", ":")

  private def decodeNode(n: QNode): QNode = n match {
    case QNode.And(l, r) => QNode.And(decodeNode(l), decodeNode(r))
    case QNode.Or(l, r) => QNode.Or(decodeNode(l), decodeNode(r))
    case QNode.Not(x, kw) => QNode.Not(decodeNode(x), kw)
    case QNode.Group(f, inner) =>
      QNode.Group(decodeSpecialTokens(f), decodeNode(inner))
    case QNode.Term(f, v) =>
      QNode.Term(f.map(decodeSpecialTokens), decodeValue(v))
  }

  private def decodeValue(v: TermValue): TermValue = v match {
    case TermValue.Exact(x) => TermValue.Exact(decodeSpecialTokens(x))
    case TermValue.Word(x) => TermValue.Word(decodeSpecialTokens(x))
    case TermValue.Cmp(op, x) => TermValue.Cmp(op, decodeSpecialTokens(x))
    case TermValue.Range(lo, hi, loIncl, hiIncl) =>
      TermValue.Range(lo.map(decodeSpecialTokens),
        hi.map(decodeSpecialTokens), loIncl, hiIncl)
    case TermValue.Exists => TermValue.Exists
  }

  /** Max grouping/negation nesting. A recursive-descent parser with no
    * bound turns `(((((…` into a StackOverflowError — an Error, not an
    * exception, so it would escape normal handling (and in a serving
    * context leave the request unanswered). 64 is far beyond any real
    * query; past it the parser fails as a normal parse error. */
  private val MaxDepth = 64

  /** Max terms in one query. The parser itself builds flat AND/OR
    * chains iteratively, but every downstream AST walk (decode, the
    * Column compiler, the English serializer) recurses once per chain
    * link — a 20k-term query (a pasted log dump) would blow THEIR
    * stacks even with the paren bound. 1024 terms is far beyond any
    * real search and keeps the deepest downstream recursion near
    * ~100 KB of stack — safe on the thinnest executor/server threads;
    * past it the parser fails loudly. */
  private val MaxTerms = 1024

  private final class P(s: String) {
    private var i = 0
    private var depth = 0
    private var terms = 0

    private def push(): Unit = {
      depth += 1
      if (depth > MaxDepth)
        throw new LuceneParseException(
          s"query nesting exceeds $MaxDepth levels")
    }
    private def pop(): Unit = depth -= 1

    private def countTerm(): Unit = {
      terms += 1
      if (terms > MaxTerms)
        throw new LuceneParseException(
          s"query exceeds $MaxTerms terms")
    }

    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char =
      if (i < s.length) s(i)
      else throw new LuceneParseException("unexpected end of input")

    /** Is keyword `kw` next (word boundary, case-sensitive like lucene)? */
    private def matchKw(kw: String): Boolean = {
      ws()
      if (s.startsWith(kw, i)) {
        val end = i + kw.length
        val boundary = end >= s.length || s(end).isWhitespace || s(end) == '('
        if (boundary) { i = end; true } else false
      } else false
    }

    private def peekKw(kw: String): Boolean = {
      val save = i
      val r = matchKw(kw); i = save; r
    }

    def parseAll(): QNode = {
      val n = parseOr()
      ws()
      if (i < s.length)
        throw new LuceneParseException(
          s"unexpected input at $i: '${s.substring(i)}'")
      n
    }

    private def parseOr(): QNode = {
      var l = parseAnd()
      while ({ ws(); peekKw("OR") }) {
        matchKw("OR")
        val neg = matchKw("NOT")
        val r = parseAnd()
        l = QNode.Or(l, if (neg) QNode.Not(r, keyword = true) else r)
      }
      l
    }

    private def parseAnd(): QNode = {
      var l = parseUnary()
      var continue = true
      while (continue) {
        ws()
        if (i >= s.length || peek == ')' || peekKw("OR")) continue = false
        else {
          val explicit = matchKw("AND")
          val neg = if (explicit) matchKw("NOT") else false
          ws()
          if (i >= s.length || peek == ')')
            if (explicit)
              throw new LuceneParseException("dangling AND")
            else continue = false
          else {
            val r = parseUnary()
            l = QNode.And(l, if (neg) QNode.Not(r, keyword = true) else r)
          }
        }
      }
      l
    }

    private def parseUnary(): QNode = {
      ws()
      if (matchKw("NOT")) {
        push()
        val n = QNode.Not(parseUnary(), keyword = true)
        pop(); n
      } else if (i < s.length && (peek == '-' || peek == '!') &&
          i + 1 < s.length && !s(i + 1).isWhitespace) {
        i += 1
        push()
        val n = QNode.Not(parseUnary())
        pop(); n
      } else parsePrimary()
    }

    private def parsePrimary(): QNode = {
      ws()
      if (i >= s.length) throw new LuceneParseException("unexpected end")
      if (peek == '(') {
        i += 1
        push()
        val n = parseOr()
        pop()
        expect(')')
        n
      } else {
        val start = i
        val word = readWordSegment()
        ws()
        if (i < s.length && s(i) == ':' && word.nonEmpty) {
          i += 1 // consume ':'
          countTerm()
          parseFieldValue(word)
        } else {
          i = start
          countTerm()
          QNode.Term(None, readTermValue())
        }
      }
    }

    /** A field name: letters/digits/`_`/`.`/`-`/`@`/`#` (dot-paths into
      * maps/JSON). Stops at ':' or whitespace or parens. */
    private def readWordSegment(): String = {
      val sb = new StringBuilder
      while (i < s.length && !s(i).isWhitespace &&
          !"():\"[]{}".contains(s(i))) {
        sb += s(i); i += 1
      }
      sb.toString
    }

    private def parseFieldValue(field: String): QNode = {
      ws()
      if (i >= s.length)
        throw new LuceneParseException(s"missing value for field $field")
      peek match {
        case '(' =>
          i += 1
          push()
          val inner = parseOr()
          pop()
          expect(')')
          QNode.Group(field, inner)
        case _ =>
          QNode.Term(Some(field), readTermValue())
      }
    }

    private def readTermValue(): TermValue = {
      ws()
      peek match {
        case '"' | '\'' => TermValue.Exact(readQuoted(peek))
        case '[' | '{' =>
          val loIncl = peek == '['
          i += 1
          val lo = readRangeBound()
          ws()
          if (!matchKw("TO"))
            throw new LuceneParseException("range missing TO")
          ws()
          val hi = readRangeBound()
          ws()
          if (i >= s.length || (peek != ']' && peek != '}'))
            throw new LuceneParseException("unclosed range")
          val hiIncl = peek == ']'
          i += 1
          TermValue.Range(lo, hi, loIncl, hiIncl)
        case '>' | '<' =>
          val op = if (i + 1 < s.length && s(i + 1) == '=') {
            val o = s(i).toString + "="; i += 2; o
          } else { val o = s(i).toString; i += 1; o }
          ws()
          val v = if (i < s.length && (peek == '"' || peek == '\''))
            readQuoted(peek)
          else readRawTerm()
          TermValue.Cmp(op, v)
        case _ =>
          val v = readRawTerm()
          if (v == "*") TermValue.Exists
          else TermValue.Word(v)
      }
    }

    private def readRangeBound(): Option[String] = {
      ws()
      val v =
        if (peek == '"' || peek == '\'') readQuoted(peek) else readRawTerm()
      if (v == "*") None else Some(v)
    }

    /** Raw term: up to whitespace / paren / bracket. Keeps `*` wildcards
      * and dots; colons inside URLs / localhost:port / escaped `\:` survive
      * via the encode/decode pre-pass in [[LuceneParser.parse]]. */
    private def readRawTerm(): String = {
      val sb = new StringBuilder
      while (i < s.length && !s(i).isWhitespace &&
          !"()[]{}\"".contains(s(i))) {
        sb += s(i); i += 1
      }
      if (sb.isEmpty)
        throw new LuceneParseException(s"expected term at $i")
      sb.toString
    }

    private def readQuoted(q: Char): String = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (i < s.length && s(i) != q) {
        if (s(i) == '\\' && i + 1 < s.length) { sb += s(i + 1); i += 2 }
        else { sb += s(i); i += 1 }
      }
      if (i >= s.length) throw new LuceneParseException("unclosed quote")
      i += 1 // closing quote
      sb.toString
    }

    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c)
        throw new LuceneParseException(s"expected '$c' at $i")
      i += 1
    }
  }
}
