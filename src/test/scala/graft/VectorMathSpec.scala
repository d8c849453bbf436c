package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.VectorOps

/** Pins the codegen'd vector-math expressions (functions/VectorMath)
  * bit-for-bit to their interpreted higher-order-function twins — the
  * forms the DuckDB oracle mirrors. Any ULP drift here would silently
  * break every q_sim_* / q_kmeans / q_emb_dup oracle hash. */
class VectorMathSpec extends AnyFunSuite {
  import SparkFixture.{spark, sf}

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .limit(50)

  private lazy val pairs = {
    val a = emb.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b")).limit(500)
  }

  private def assertBitwiseEqual(exprCol: org.apache.spark.sql.Column,
      hofCol: org.apache.spark.sql.Column, what: String): Unit = {
    val rows = pairs.select(exprCol.as("e"), hofCol.as("h")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getDouble(0)
      val h = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(e) == java.lang.Double.doubleToRawLongBits(h),
        s"$what: expression $e != HOF $h")
    }
  }

  test("dot product: codegen'd loop == sequential HOF fold, bitwise") {
    assertBitwiseEqual(
      VectorOps.dot(col("va"), col("vb")), VectorOps.dotHof(col("va"), col("vb")), "dot")
  }

  test("cosine: one-pass loop == HOF dot/(norm*norm), bitwise") {
    assertBitwiseEqual(
      VectorOps.cosine(col("va"), col("vb")), VectorOps.cosineHof(col("va"), col("vb")), "cosine")
  }

  test("l2sq: codegen'd loop == sequential HOF fold, bitwise") {
    assertBitwiseEqual(
      VectorOps.l2sq(col("va"), col("vb")), VectorOps.l2sqHof(col("va"), col("vb")), "l2sq")
  }

  test("subspace l2: windowed loop == HOF fold over slices, bitwise, all 8 subspaces") {
    (0 until 8).foreach { s =>
      assertBitwiseEqual(
        graft.functions.VectorMath.l2sqRange(col("va"), col("vb"), 8 * s, 8),
        VectorOps.subDistHof(col("va"), col("vb"), s), s"subspace $s")
    }
  }

  test("null semantics mirror zip_with padding and null-element poisoning") {
    val df = spark.sql("""
      SELECT * FROM VALUES
        (array(1.0d, 2.0d), array(3.0d, 4.0d)),          -- clean
        (array(1.0d, 2.0d), array(3.0d)),                -- length mismatch
        (array(1.0d, cast(null as double)), array(3.0d, 4.0d)), -- null element
        (array(), array())                                -- empty
      AS t(a, b)""")
    val got = df.select(
      VectorOps.dot(col("a"), col("b")).as("e_dot"),
      VectorOps.dotHof(col("a"), col("b")).as("h_dot"),
      VectorOps.l2sq(col("a"), col("b")).as("e_l2"),
      VectorOps.l2sqHof(col("a"), col("b")).as("h_l2")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot null mismatch: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"l2sq null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3))
    }
    // cosine over the clean row only (0-norm rows divide by zero the
    // same way on both forms but NaN != NaN under ==)
    val c = df.limit(1).select(
      VectorOps.cosine(col("a"), col("b")).as("e"),
      VectorOps.cosineHof(col("a"), col("b")).as("h")).head()
    assert(java.lang.Double.doubleToRawLongBits(c.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(c.getDouble(1)))
  }

  test("ScaledMeans aggregate == posexplode/scaledMean chain, bitwise") {
    val full = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val assigned = VectorOps.assignJoin(full, VectorOps.ivfCentroids(spark, sf))
      .select(col("cluster"), col("v"))
    val viaAgg = assigned.groupBy(col("cluster"))
      .agg(graft.functions.ScaledMeans.scaledMeans(0, -1)(col("v")).as("cv_agg"))
      .select(col("cluster").as("c_label"), col("cv_agg"))
    val viaExplode = VectorOps.elementMeansExplode(assigned)
      .select(col("c_label"), col("cv").as("cv_exp"))
    val joined = viaAgg.join(viaExplode, Seq("c_label"))
    assert(joined.count() > 0)
    assert(joined.filter(col("cv_agg") =!= col("cv_exp")).count() == 0,
      "aggregate means must replay sum(round(x*1e9)::long)::double/1e9/count exactly")
  }

  test("SubspaceArgmins expression == per-subspace struct-min twin (HOF distances)") {
    val full = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cent = VectorOps.ivfCentroids(spark, sf)
    val cents = cent.select(col("c_label").cast("int"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    val viaExpr = full.select(col("vec_id"),
      graft.functions.VectorMath.subspaceArgmins(col("v"), cents, 8).as("cs"))
    val viaJoin = full.crossJoin(broadcast(cent))
      .select(Seq(col("vec_id")) ++ (0 until 8).map(s =>
        struct(VectorOps.subDistHof(col("v"), col("cv"), s).as("d"),
          col("c_label").as("l")).as(s"dc$s")): _*)
      .groupBy(col("vec_id"))
      .agg(min(col("dc0")).getField("l").as("t0"),
        (1 until 8).map(s => min(col(s"dc$s")).getField("l").as(s"t$s")): _*)
    val joined = viaExpr.join(viaJoin, Seq("vec_id"))
    val mismatches = (0 until 8).map(s =>
      joined.filter(element_at(col("cs"), s + 1) =!= col(s"t$s")).count()).sum
    assert(mismatches == 0, "all 8 subspace argmins must match the struct-min form")
  }

  test("sq8 quantization: codes bounded to int8 range, extremes hit 0 and 255, ranking sane") {
    val out = VectorOps.qSq8(spark, sf).collect()
    assert(out.nonEmpty && out.length == 25) // 5 queries x top-5
    // integer scores strictly ordered per query (desc, vec_id tiebreak)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not descending: $scores")
    }
    // the codes themselves: every component lands in [0, 255], and the
    // per-dimension extremes map to exactly 0 and 255 (lossless at the
    // range edges — the scalar-quantizer contract)
    val emb = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("v"))
    val dims = emb.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("pos")).collect()
    val mnA = array(dims.map(r => lit(r.getDouble(1))): _*)
    val rgA = array(dims.map(r => lit(r.getDouble(2) - r.getDouble(1))): _*)
    val codes = emb.select(explode(transform(col("v"), (x, i) =>
      floor((x - element_at(mnA, i + 1)) / element_at(rgA, i + 1) * 255.0 + 0.5)
        .cast("long"))).as("c"))
    assert(codes.filter(col("c") < 0 || col("c") > 255).count() == 0)
    assert(codes.filter(col("c") === 0).count() > 0 && codes.filter(col("c") === 255).count() > 0)
  }

  test("nearest-centroid expression == crossJoin argmin twin on the full corpus") {
    val full = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cent = VectorOps.ivfCentroids(spark, sf)
    val cents = cent.select(col("c_label"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    val viaExpr = full.select(col("vec_id"),
      graft.functions.VectorMath.nearestCentroid(col("v"), cents).as("c_expr"))
    val viaJoin = VectorOps.assignJoin(full, cent)
      .select(col("vec_id"), col("cluster").as("c_twin"))
    assert(viaExpr.join(viaJoin, Seq("vec_id"))
      .filter(col("c_expr") =!= col("c_twin")).count() == 0,
      "expression argmin must replay min(struct(dist, label)) exactly")
    assert(viaExpr.count() == full.count())
  }
}
