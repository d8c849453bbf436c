package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.etl.CacheSemantics

/** Laws for the reference-derived cache expressions (SURVEY §5.3):
  * URL-normalization invariants (ref `pipeline/utils/cache.py:29-39`),
  * TTL clamp bounds (`cache.py:83-94`), key format (`cache.py:57-74`). */
class CacheSemanticsSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private def norm1(url: String): String =
    Seq(url).toDF("u").select(CacheSemantics.normalizeUrl(col("u"))).head.getString(0)

  test("normalizeUrl: sorts query pairs, lowercases scheme+host, drops fragment") {
    assert(norm1("HTTPS://Api.Example.COM/v1/x?b=2&a=1#frag")
      == "https://api.example.com/v1/x?a=1&b=2")
  }

  test("normalizeUrl: no query, no fragment is identity apart from case") {
    assert(norm1("http://HOST/path") == "http://host/path")
    assert(norm1("http://host/path?") == "http://host/path")
  }

  test("normalizeUrl: path case is preserved") {
    assert(norm1("http://h/CaseSensitive/Path?z=1") == "http://h/CaseSensitive/Path?z=1")
  }

  test("normalizeUrl: query-param permutation invariance (seeded property)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val params = (1 to 1 + rnd.nextInt(4)).map(i => s"k${rnd.nextInt(9)}=${rnd.nextInt(999)}")
      val a = s"http://h/p?${params.mkString("&")}"
      val b = s"http://h/p?${rnd.shuffle(params).mkString("&")}"
      assert(norm1(a) == norm1(b), s"$a vs $b")
    }
  }

  test("normalizeUrl is idempotent") {
    val urls = Seq("HTTPS://A.B/x?b=2&a=1#f", "http://h/p", "http://h/p?k=v")
    urls.foreach(u => assert(norm1(norm1(u)) == norm1(u)))
  }

  test("ttl: clamp to [0, 86400], no-store forces 0 (seeded property)") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0, 0), (86400, 0), (86401, 0), (500000, 5000)) ++
      (1 to 16).map(_ => (rnd.nextInt(200000), rnd.nextInt(5000)))
    val df = cases.map { case (ma, swr) => s"max-age=$ma, stale-while-revalidate=$swr" }.toDF("cc")
      .select(CacheSemantics.calculateTtl(col("cc")).as("t")).collect().map(_.getInt(0))
    df.zip(cases).foreach { case (ttl, (ma, swr)) =>
      assert(ttl == math.min(ma.toLong + swr, 86400L).toInt, s"ma=$ma swr=$swr")
    }
    val ns = Seq("no-store, max-age=100").toDF("cc")
      .select(CacheSemantics.calculateTtl(col("cc"))).head.getInt(0)
    assert(ns == 0)
  }

  test("maxAge: 0 when directive missing; first occurrence wins") {
    val df = Seq("public", "max-age=7, max-age=9").toDF("cc")
      .select(CacheSemantics.maxAge(col("cc")).as("ma")).collect()
    assert(df.map(_.getInt(0)).toSeq == Seq(0, 7))
  }

  test("cacheKey: ns:v1:<64-hex> format, deterministic, url-sensitive") {
    val keys = Seq(("u1", "a"), ("u1", "a"), ("u2", "a")).toDF("u", "acc")
      .select(CacheSemantics.cacheKey(lit("ns"), col("u"), col("acc")).as("k"))
      .collect().map(_.getString(0))
    assert(keys.forall(_.matches("ns:v1:[0-9a-f]{64}")))
    assert(keys(0) == keys(1) && keys(0) != keys(2))
  }

  test("isStale: max_age==0 fresh; null ttl stale; else age >= max_age") {
    val rows = Seq((10, 60, 0), (10, 60, 30), (40, 60, 30)).toDF("age", "ttl", "ma")
      .select(CacheSemantics.isStale(col("age"), col("ttl"), col("ma")).as("s"))
      .collect().map(_.getBoolean(0))
    assert(rows.toSeq == Seq(false, false, true))
    val nullTtl = Seq((10, 30)).toDF("age", "ma")
      .select(CacheSemantics.isStale(col("age"), lit(null).cast("int"), col("ma")))
      .head.getBoolean(0)
    assert(nullTtl)
  }

  test("relevantHeaders: allowlists and lowercases keys") {
    val m = Seq(1).toDF("x").select(CacheSemantics.relevantHeaders(
        map(lit("Accept"), lit("application/json"), lit("X-Api-Key"), lit("secret"),
          lit("Content-Type"), lit("text/html"))).as("h"))
      .head.getAs[Map[String, String]]("h")
    assert(m == Map("accept" -> "application/json", "content-type" -> "text/html"))
  }
}
