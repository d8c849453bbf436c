package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ANSI error semantics (Spark 4 default, matching the reference's
  * fail-loud casts, `normalize.py:11`): overflow and invalid casts
  * RAISE instead of wrapping/nulling, and each has a `try_`-prefixed
  * graceful twin — the pair a pipeline chooses between per column. */
class AnsiSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  test("cast overflow raises; try_cast nulls") {
    intercept[Exception] {
      Seq(300).toDF("x").select(col("x").cast("byte")).collect()
    }
    val r = Seq(300).toDF("x").select(expr("try_cast(x AS BYTE)").as("b")).head()
    assert(r.isNullAt(0))
  }

  test("string-to-int cast failure raises; try_cast nulls") {
    intercept[Exception] {
      Seq("notanumber").toDF("s").select(col("s").cast("int")).collect()
    }
    val r = Seq("notanumber").toDF("s").select(expr("try_cast(s AS INT)").as("i")).head()
    assert(r.isNullAt(0))
  }

  test("long-sum overflow raises in aggregates; try_sum nulls") {
    val big = Seq(Long.MaxValue, Long.MaxValue).toDF("x")
    intercept[Exception] { big.agg(sum(col("x"))).collect() }
    val r = big.agg(expr("try_sum(x)").as("s")).head()
    assert(r.isNullAt(0), s"try_sum should null on overflow, got $r")
  }

  test("arithmetic overflow raises element-wise; try_add nulls") {
    val df = Seq(Long.MaxValue).toDF("x")
    intercept[Exception] { df.select(col("x") + 1L).collect() }
    val r = df.select(expr("try_add(x, 1)").as("y")).head()
    assert(r.isNullAt(0))
  }

  test("division by zero raises; try_divide nulls") {
    val df = Seq(1).toDF("x")
    intercept[Exception] { df.select(col("x") / lit(0)).collect() }
    val r = df.select(expr("try_divide(x, 0)").as("d")).head()
    assert(r.isNullAt(0))
  }
}
