package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExtensionsNullSafetySpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  test("GraftExtensions registers minhash_slices for the SQL surface") {
    // getOrCreate would reuse the fixture session and silently drop
    // withExtensions — apply the injections to the live session's
    // registry instead (same mechanism SparkSession.applyExtensions uses)
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts)
    org.apache.spark.sql.GraftSqlBridge.registerInjectedFunctions(exts, spark)
    val m = spark.sql("SELECT minhash_slices(array('a','b','c','d'), 1, 3) AS m")
    assert(m.select(size(col("m"))).head.getInt(0) == 8)
    val hex = m.select(col("m").getItem(0)).head.getString(0)
    assert(hex.matches("[0-9a-f]{8}"))
    // default args + equivalence with the Column API
    val viaSql = spark.sql("SELECT minhash_slices(array('x','y','z','w')) AS m").head.getSeq[String](0)
    val viaCol = Seq(Seq("x", "y", "z", "w")).toDF("toks")
      .select(graft.functions.MinhashSlices.minhashSlices(col("toks"), 0).as("m"))
      .head.getSeq[String](0)
    assert(viaSql == viaCol)
  }

  // The driver corpus is null-free; these pin the operators' null
  // semantics explicitly (100 TB data always has nulls).
  test("joins: null keys never match (SQL semantics)") {
    val a = Seq((Some(1L), "x"), (None, "y")).toDF("k", "va")
    val b = Seq((Some(1L), "p"), (None, "q")).toDF("k", "vb")
    assert(a.join(b, Seq("k")).count() == 1)
    assert(a.join(b, Seq("k"), "left_anti").count() == 1) // null-key row doesn't match
  }

  test("aggregates: sum/avg skip nulls, count(*) does not") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val r = df.agg(sum(graft.ops.Exact.dec(col("x"))).cast("double"),
      count(lit(1)), count(col("x"))).head
    assert(r.getDouble(0) == 4.0 && r.getLong(1) == 3 && r.getLong(2) == 2)
  }

  test("windows: null order keys sort first (asc default), rows still ranked") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1, Some(10)), (1, None), (1, Some(5))).toDF("g", "v")
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy(col("v"))))
    val first = df.filter(col("rn") === 1).select("v").head
    assert(first.isNullAt(0))
  }

  test("cache semantics: null inputs propagate, not crash") {
    val df = Seq[Option[String]](None).toDF("cc")
    val r = df.select(graft.etl.CacheSemantics.maxAge(col("cc")).as("ma"),
      graft.etl.CacheSemantics.calculateTtl(col("cc")).as("ttl")).head
    // null cache-control: rlike(null) is null -> otherwise-branch 0
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
  }

  test("dedup: docs with null text are excluded, not crashing") {
    val df = Seq((1L, Some("a b c d e")), (2L, None)).toDF("doc_id", "text")
    val sigs = graft.dedup.Dedup.bandedSignatures(df)
    assert(sigs.select("doc_id").distinct().count() == 1)
  }
}
