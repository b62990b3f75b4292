package graft.analysis

import graft.SparkSpec

class ForecastSpec extends SparkSpec {
  import spark.implicits._

  test("holtLinear tracks a perfect linear ramp: trend converges to " +
      "the slope and the h-step forecast extrapolates it") {
    // x_t = 10t: l/b recursions at α=β=0.5 converge onto the line
    val df = (1 to 12).map(t => ("s", t.toLong, 10.0 * t))
      .toDF("k", "b", "x")
    val out = Forecast.holtLinear(df, Seq("k"), "b", "x", horizon = 3)
      .orderBy("b").collect()
    // seed: l₁ = x₁, b₁ = 0, fitted null
    assert(out.head.getDouble(out.head.fieldIndex("level")) == 10.0)
    assert(out.head.getDouble(out.head.fieldIndex("trend")) == 0.0)
    assert(out.head.isNullAt(out.head.fieldIndex("fitted")))
    // late in the ramp the trend is ≈ the true slope and the forecast
    // ≈ the true future value
    val last = out.last
    val lvl = last.getDouble(last.fieldIndex("level"))
    val trd = last.getDouble(last.fieldIndex("trend"))
    assert(math.abs(trd - 10.0) < 1.5, s"trend $trd")
    assert(math.abs(lvl - 120.0) < 5.0, s"level $lvl")
    assert(math.abs(last.getDouble(last.fieldIndex("forecast_h")) -
      (lvl + 3 * trd)) < 1e-12)
    // one-step fit: fitted_t = l_{t-1} + b_{t-1}
    val l2 = out(1)
    assert(l2.getDouble(l2.fieldIndex("fitted")) == 10.0) // l₁+b₁
  }

  test("holtLinear dead-reckons a missing bucket along the trend " +
      "instead of poisoning the recursion") {
    val df = Seq(("s", 1L, Some(10.0)), ("s", 2L, Some(20.0)),
      ("s", 3L, None), ("s", 4L, Some(40.0))).toDF("k", "b", "x")
    val out = Forecast.holtLinear(df, Seq("k"), "b", "x")
      .orderBy("b").collect()
    val r3 = out(2)
    // t=2: l = .5·20+.5·10 = 15, b = .5·5 = 2.5
    // t=3 (null): l = 17.5, b = 2.5, fitted = 17.5
    assert(r3.getDouble(r3.fieldIndex("level")) == 17.5)
    assert(r3.getDouble(r3.fieldIndex("trend")) == 2.5)
    assert(r3.getDouble(r3.fieldIndex("fitted")) == 17.5)
    // t=4 still numeric (not NaN-poisoned)
    val r4 = out(3)
    assert(!r4.isNullAt(r4.fieldIndex("level")))
    assert(r4.getDouble(r4.fieldIndex("level")) == 30.0) // .5·40+.5·20
  }

  test("holtLinear leading-null rows are all-null (trend included) " +
      "until the series seeds") {
    val df = Seq(("s", 1L, None), ("s", 2L, Some(10.0)),
      ("s", 3L, Some(20.0))).toDF("k", "b", "x")
    val out = Forecast.holtLinear(df, Seq("k"), "b", "x")
      .orderBy("b").collect()
    val r1 = out.head
    for (c <- Seq("level", "trend", "fitted", "forecast_h"))
      assert(r1.isNullAt(r1.fieldIndex(c)), s"$c not null pre-seed")
    // the seed lands on the first non-null point
    assert(out(1).getDouble(out(1).fieldIndex("level")) == 10.0)
    assert(out(1).getDouble(out(1).fieldIndex("trend")) == 0.0)
  }
}

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("categoricalDrift: identical distributions give ~zero KL and " +
      "chi-square; a shifted category localizes the drift") {
    val ref = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c")).toDF("k")
    val same = Drift.categoricalDrift(ref, ref, "k")
      .orderBy("k").collect()
    // KL is exactly 0 (p == q); chi-square is NEAR 0 — the smoothing
    // shifts expectations slightly off the raw counts
    assert(same.forall(r =>
      math.abs(r.getDouble(r.fieldIndex("kl_term"))) < 1e-9 &&
        r.getDouble(r.fieldIndex("chi2_term")) < 0.01))
    // current: 'a' doubles at 'c''s expense; 'd' appears from nowhere
    val cur = (Seq.fill(70)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(10)("d")).toDF("k")
    val out = Drift.categoricalDrift(ref, cur, "k")
      .orderBy("k").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    // one-sided categories keep finite terms (smoothing)
    assert(!out("d").getDouble(out("d").fieldIndex("kl_term")).isInfinite)
    assert(out("c").getLong(out("c").fieldIndex("n_cur")) == 0L)
    // the mover carries more KL than the stable category
    assert(out("a").getDouble(out("a").fieldIndex("kl_term")) >
      out("b").getDouble(out("b").fieldIndex("kl_term")))
    // total drift is positive
    val kl = out.values.map(r => r.getDouble(r.fieldIndex("kl_term"))).sum
    assert(kl > 0.0)
  }

  test("ksDrift: identical samples score D = 0, disjoint samples " +
      "score D = 1, a known quartile shift scores exactly 0.25, and " +
      "an empty side answers null") {
    def mk(k: String, vs: Seq[Double]) = vs.map((k, _)).toDF("k", "v")
    // same: D = 0, not drifted
    val a = mk("s", Seq(1.0, 2.0, 3.0, 4.0))
    val same = Drift.ksDrift(a, a, Seq("k"), "v").collect().head
    assert(same.getDouble(same.fieldIndex("d_stat")) == 0.0)
    assert(same.getLong(same.fieldIndex("drifted")) == 0L)
    // disjoint ranges: D = 1
    val b = mk("s", Seq(10.0, 11.0, 12.0, 13.0))
    val dis = Drift.ksDrift(a, b, Seq("k"), "v").collect().head
    assert(dis.getDouble(dis.fieldIndex("d_stat")) == 1.0)
    assert(dis.getLong(dis.fieldIndex("drifted")) == 1L)
    // ref {1,2,3,4} vs cur {2,3,4,5}: sup gap at v=1 (1/4 vs 0) and
    // v=4 (1 vs 3/4) — exactly 0.25
    val c = mk("s", Seq(2.0, 3.0, 4.0, 5.0))
    val q = Drift.ksDrift(a, c, Seq("k"), "v").collect().head
    assert(q.getDouble(q.fieldIndex("d_stat")) == 0.25)
    // a key with one empty side: null D and null drifted
    val refTwo = mk("s", Seq(1.0)).unionByName(mk("t", Seq(1.0)))
    val curOne = mk("s", Seq(1.0))
    val rows = Drift.ksDrift(refTwo, curOne, Seq("k"), "v")
      .orderBy("k").collect()
    assert(rows(1).getString(0) == "t" &&
      rows(1).isNullAt(rows(1).fieldIndex("d_stat")) &&
      rows(1).isNullAt(rows(1).fieldIndex("drifted")))
    // maxDistinct audit is loud
    val wide = mk("s", (1 to 100).map(_.toDouble))
    val e = intercept[IllegalArgumentException] {
      Drift.ksDrift(wide, wide, Seq("k"), "v", maxDistinct = 10)
    }
    assert(e.getMessage.contains("maxDistinct"))
  }

  test("psiDrift: identical sides give ~zero terms; a shifted " +
      "distribution concentrates PSI in the moved bins; constant " +
      "reference routes to bin 0; out-of-range current values clamp") {
    def mk(k: String, vs: Seq[Double]) = vs.map((k, _)).toDF("k", "v")
    val ref = mk("s", (1 to 100).map(_.toDouble))
    val same = Drift.psiDrift(ref, ref, Seq("k"), "v", bins = 10)
      .collect()
    assert(same.length == 10)
    assert(same.forall(r =>
      math.abs(r.getDouble(r.fieldIndex("psi_term"))) < 1e-9))
    // shift the mass up: high bins gain, low bins lose; total PSI > 0
    val cur = mk("s", (51 to 150).map(_.toDouble))
    val out = Drift.psiDrift(ref, cur, Seq("k"), "v", bins = 10)
      .orderBy("bin").collect()
    val total = out.map(_.getDouble(out.head.fieldIndex("psi_term"))).sum
    assert(total > 0.25, s"psi total $total") // a half-range shift is loud
    // values past the ref max clamp into bin 9 (101..150 all land
    // there), so bin 9's n_cur carries half the current corpus
    val b9 = out.find(_.getInt(out.head.fieldIndex("bin")) == 9).get
    assert(b9.getLong(b9.fieldIndex("n_cur")) >= 50L)
    // constant reference: everything in bin 0, terms finite
    val const = mk("s", Seq.fill(10)(5.0))
    val cst = Drift.psiDrift(const, mk("s", Seq(5.0, 7.0)), Seq("k"),
      "v", bins = 10).collect()
    assert(cst.length == 1 && cst.head.getInt(
      cst.head.fieldIndex("bin")) == 0)
    // a key the reference never saw surfaces as one null-bin row
    // with null terms — never silently dropped, never a fake number
    val newKey = Drift.psiDrift(ref, mk("t", Seq(1.0, 2.0)), Seq("k"),
      "v", bins = 10).filter(org.apache.spark.sql.functions
        .col("k") === "t").collect()
    assert(newKey.length == 1)
    val nk = newKey.head
    assert(nk.isNullAt(nk.fieldIndex("bin")) &&
      nk.getLong(nk.fieldIndex("n_cur")) == 2L &&
      nk.isNullAt(nk.fieldIndex("psi_term")))
  }
}
