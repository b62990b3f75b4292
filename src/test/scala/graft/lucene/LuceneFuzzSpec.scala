package graft.lucene

import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz of the parser's total-function contract (the repo's
  * FuzzInvariantsSpec convention — fixed seed, no flake budget): ANY
  * input string either parses to an AST or raises LuceneParseException —
  * never a StackOverflowError, NullPointerException, or hang. The search
  * box is the engine's most adversarial input surface. */
class LuceneFuzzSpec extends AnyFunSuite {

  private val junkAlphabet: Array[Char] =
    ("abcXYZ019" + " :*\"()[]{}" + "-!<>=._/\\'" + "\tANDORNOTTO" +
      "%€中").toCharArray

  test("parse is total over junk: AST or LuceneParseException, " +
      "nothing else") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val n = rnd.nextInt(80)
      val q = Array.fill(n)(junkAlphabet(
        rnd.nextInt(junkAlphabet.length))).mkString
      try { LuceneParser.parse(q); () }
      catch { case _: LuceneParseException => () }
    }
  }

  test("well-formed composites parse and serialize to English") {
    val rnd = new scala.util.Random(7)
    def word(): String =
      Array.fill(1 + rnd.nextInt(5))(('a' + rnd.nextInt(26)).toChar)
        .mkString
    def term(): String = rnd.nextInt(8) match {
      case 0 => word()
      case 1 => word() + "*"
      case 2 => "*" + word()
      case 3 => s"${word()}:${word()}"
      case 4 => s"""${word()}:"${word()} ${word()}""""
      case 5 => s"${word()}:(${word()} OR ${word()})"
      case 6 => s"${word()}:>${rnd.nextInt(100)}"
      case 7 => s"${word()}:[${rnd.nextInt(10)} TO ${10 + rnd.nextInt(90)}]"
    }
    for (_ <- 1 to 1000) {
      val parts = (1 to 1 + rnd.nextInt(5)).map { _ =>
        val op = rnd.nextInt(4) match {
          case 0 => ""
          case 1 => "AND "
          case 2 => "OR "
          case 3 => "NOT "
        }
        op + term()
      }
      // an operator can't open the query — strip a leading connective
      val q = parts.mkString(" ")
        .replaceAll("^(AND|OR) ", "")
      val ast = LuceneParser.parse(q)
      assert(ast.nonEmpty, q)
      assert(EnglishSerializer.explain(q).nonEmpty, q)
    }
  }

  test("pathological nesting fails loudly instead of blowing the stack") {
    val deep = "(" * 5000 + "a" + ")" * 5000
    val e = intercept[LuceneParseException](LuceneParser.parse(deep))
    assert(e.getMessage.contains("nesting"))
    intercept[LuceneParseException](LuceneParser.parse("-" * 5000 + "a"))
    intercept[LuceneParseException](
      LuceneParser.parse("f:" + "(" * 5000 + "x" + ")" * 5000))
    // 60 levels is fine (just under the bound)
    assert(LuceneParser.parse("(" * 60 + "a" + ")" * 60).nonEmpty)
  }

  test("flat mega-queries fail loudly too — downstream AST walks " +
      "recurse once per implicit-AND link") {
    val flat = Array.fill(20000)("a").mkString(" ")
    val e = intercept[LuceneParseException](LuceneParser.parse(flat))
    assert(e.getMessage.contains("terms"))
    // 1000 terms still parses, decodes, and explains
    val ok = Array.fill(1000)("a").mkString(" ")
    assert(LuceneParser.parse(ok).nonEmpty)
    assert(EnglishSerializer.explain(ok).nonEmpty)
  }
}
