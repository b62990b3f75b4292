package graft

import graft.streaming.HeavyHittersStream.Summary

/** Evidence main for SCALE.md's SpaceSaving-fold row: feeds a
  * deterministic skewed synthetic stream (LCG — no Math.random, so
  * runs replay exactly) through the shipped
  * [[graft.streaming.HeavyHittersStream.Summary]] and prints
  * events/sec. The stream shape is chosen to be eviction-heavy
  * (100k-key space at capacity 4096, ~2/3 cold keys), the worst case
  * for the fold: every cold event past capacity is an eviction.
  *
  *   sbt "runMain graft.HeavyHittersProbe [nEvents] [capacity]"
  */
object HeavyHittersProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 2000000
    val capacity = if (args.length > 1) args(1).toInt else 4096
    var seed = 12345L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    (1 to 3).foreach { pass =>
      seed = 12345L
      val s = new Summary(capacity)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        val r = (next() >>> 33).toInt
        val k = if (r % 3 == 0) "hot" + (r % 64) else "k" + (r % 100000)
        s.feed(k)
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"ss_fold_pass$pass","events":$n,""" +
        f""""capacity":$capacity,"sec":$sec%.3f,""" +
        f""""events_per_sec":${n / sec}%.0f,"summary":${s.size}}""")
    }
  }
}
