package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism regression guard: every declared query must produce
  * byte-identical rows when executed twice in the same session at
  * sf0.001. Catches accidental nondeterminism (rand-based sampling,
  * unstable orderings, time-dependent expressions) before it reaches
  * the driver's oracle gate — the cross-engine hash compare only works
  * because every query is a pure function of its inputs. */
class DeterminismSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name: two executions, identical rows") {
      val a = fn(spark, sf).collect().map(_.toString)
      val b = fn(spark, sf).collect().map(_.toString)
      assert(a.length == b.length, s"row count drifted: ${a.length} vs ${b.length}")
      a.zip(b).zipWithIndex.collectFirst { case ((x, y), i) if x != y => (i, x, y) }
        .foreach { case (i, x, y) => fail(s"row $i drifted:\n  $x\n  $y") }
    }
  }
}
