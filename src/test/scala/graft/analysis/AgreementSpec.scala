package graft.analysis

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: perfect agreement scores 1, chance-level " +
      "agreement scores ~0, degenerate single-label data answers " +
      "null, and null labels are dropped") {
    // perfect: every row agrees
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c"))
      .toDF("x", "y")
    val p = Agreement.cohenKappa(perfect, "x", "y").collect().head
    assert(p.getLong(p.fieldIndex("n")) == 4L)
    assert(p.getDouble(p.fieldIndex("po")) == 1.0)
    assert(p.getDouble(p.fieldIndex("kappa")) == 1.0)
    // textbook 2x2: po=.7, both marginals (.5,.5) → pe=.5, kappa=.4
    val mixed = (Seq.fill(35)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(15)(("n", "y")) ++ Seq.fill(35)(("n", "n")))
      .toDF("x", "y")
    val m = Agreement.cohenKappa(mixed, "x", "y").collect().head
    assert(m.getDouble(m.fieldIndex("po")) == 0.7)
    assert(m.getDouble(m.fieldIndex("pe")) == 0.5)
    assert(m.getDouble(m.fieldIndex("kappa")) == 0.4)
    // degenerate: both constant on one label → pe = 1 → null kappa
    val const = Seq.fill(5)(("a", "a")).toDF("x", "y")
    val c = Agreement.cohenKappa(const, "x", "y").collect().head
    assert(c.isNullAt(c.fieldIndex("kappa")))
    assert(c.getDouble(c.fieldIndex("po")) == 1.0)
    // null labels drop from n
    val withNull = Seq(("a", "a"), (null, "a"), ("a", null))
      .toDF("x", "y")
    val w = Agreement.cohenKappa(withNull, "x", "y").collect().head
    assert(w.getLong(w.fieldIndex("n")) == 1L)
  }

  test("cohenKappa is partition-order independent (integer math " +
      "until the final division)") {
    val rows = (1 to 400).map(i =>
      (s"l${i % 5}", s"l${(i * 7) % 5}")).toDF("x", "y")
    val a = Agreement.cohenKappa(rows, "x", "y").collect().head
    val b = Agreement.cohenKappa(rows.repartition(13), "x", "y")
      .collect().head
    assert(a == b)
  }
}
