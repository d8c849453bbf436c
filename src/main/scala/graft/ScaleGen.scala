package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler: replicates the driver-generated sf0.1
  * tables N× with key-offset copies so the bench can be measured at a
  * data size where cost is DATA-bound, not fixed-cost-bound (PERF.md:
  * at 17 MB every query is dominated by ~0.2–0.5 s of plan/codegen/job
  * setup; scaling slopes need a bigger corpus).
  *
  * Design rules, per table family:
  *  - **Star schema**: every copy shifts each key by `copy * (maxKey+1)`
  *    with the SAME offset used for the key on both FK sides, so join
  *    fan-outs, selectivities and group cardinalities per key stay
  *    exactly those of the source corpus — data volume grows 10×, data
  *    SHAPE stays fixed (that is what a scaling slope must hold fixed).
  *  - **documents**: copy 0 is byte-identical; copies > 0 salt ~1/3 of
  *    tokens *content-hashed* (`pmod(hash(token),3)=0 → token~c`). The
  *    map is injective per copy and content- (not position-) dependent,
  *    so within-copy shingle-set jaccard is EXACTLY preserved (near-dup
  *    pair density grows linearly), while every cross-copy 3-shingle
  *    window contains a salted token with prob 1-(2/3)³ ≈ 0.70 → cross
  *    copy jaccard ≈ 0.17, far below the 0.3/0.7 separation band — no
  *    quadratic cross-copy near-dup blowup.
  *  - **embeddings**: copies > 0 perturb the parent vector with seeded
  *    gaussian noise (σ=1.5 on a unit vector) and renormalize:
  *    parent↔copy cosine ≈ 0.55 (keeps the label/cluster geometry that
  *    IVF/k-means partition on), copy↔copy ≈ 0.31 (below the corpus'
  *    natural 0.48 max — no artificial near-dup pairs).
  *  - **events**: ts kept verbatim (nanos epoch as int64 — exactly what
  *    `Tables.events` reads), user/event ids offset per copy.
  *  - region/nation are fixed-size dimensions at every TPC-H sf: copied.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <outDir> <copies>
  *        runMain graft.ScaleGen <srcDir> <outDir> <copies> embeddings <sigma>
  * The second form writes ONLY a scaled embeddings table with the given
  * perturbation σ — the CLUSTERED ANN-evaluation corpus (σ≈0.25 plants
  * paraphrase-tier clusters: parent↔copy cos ≈ 0.97, sibling ≈ 0.94,
  * far above the corpus' natural 0.48 max, so exact top-k is
  * well-separated ground truth and ANN recall becomes a REAL signal —
  * the default σ=1.5 near-random geometry keeps near-dup densities
  * linear for the bench ladder but makes recall structurally
  * meaningless; see the r7 sf100 study).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 3 && args(3) == "embeddings")
      scaleEmbeddings(spark, src, out, copies, args(4).toDouble)
    else scale(spark, src, out, copies)
    spark.stop()
  }

  /** Scale only the embeddings table, with an explicit perturbation σ
    * (the full-corpus scale() uses σ=1.5; clustered ANN-eval corpora
    * use a tight σ so each parent + its copies form a genuine
    * neighborhood). Same seeded, deterministic generator. */
  def scaleEmbeddings(spark: SparkSession, src: String, out: String,
      copies: Int, sigmaTotal: Double): Unit = {
    val cps = broadcast(spark.range(0, copies).toDF("cp"))
    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    val vOff = embeddings.agg(max(col("vec_id"))).head.getLong(0) + 1L
    import spark.implicits._
    val scaled = embeddings.repartition(32).crossJoin(cps)
      .select(col("vec_id"), col("cp"), col("embedding"), col("label"))
      .as[(Long, Long, Seq[Float], Int)]
      .map { case (id, cp, vec, label) =>
        if (cp == 0L) (id, vec, label)
        else {
          val rnd = new java.util.Random(id * 1000003L + cp * 7919L)
          val sigma = sigmaTotal.toFloat / math.sqrt(vec.length).toFloat
          val noisy = vec.map(v => v + sigma * rnd.nextGaussian().toFloat)
          val norm = math.sqrt(noisy.map(x => x.toDouble * x).sum).toFloat
          (id + cp * vOff, noisy.map(_ / norm), label)
        }
      }.toDF("vec_id", "embedding", "label")
    val n = math.max(2, math.min(64, 2 * copies / 4))
    scaled.repartition(n).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def scale(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    // events.ts is TIMESTAMP(NANOS); read it as int64 nanos (same conf
    // Tables.events uses) regardless of which session calls us
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cps = broadcast(spark.range(0, copies).toDF("cp"))
    // The replication map stage inherits the SOURCE's split count: a
    // 17 MB source coalesces into 1-2 input splits, so at 1000 copies a
    // single task generated and spill-merged the entire 40+ GB shuffle
    // (observed: one copyFileStreamNIO merge pinned for >30 min at
    // sf100). Spreading the source across the cluster first costs a
    // source-sized (tiny) shuffle and buys full-width parallelism in
    // the expensive replicate+shift+write stage.
    def rep(df: DataFrame): DataFrame = df.repartition(32).crossJoin(cps)
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L
    def shifted(c: String, o: Long) = (col(c) + col("cp") * lit(o)).cast("long").as(c)
    // File counts scale with the copy factor: a scaled corpus written
    // as 1-2 big single-row-group files is UNSPLITTABLE — Spark assigns
    // a parquet row group to one task, so every narrow kernel pass at
    // sf10 ran single-threaded no matter what maxPartitionBytes said
    // (root cause of the inflated "linear text kernel" sf10 numbers
    // before the round-4 regeneration; a real 100 TB corpus is
    // thousands of files). Target ≈ baseFiles per 4 copies, capped at
    // 64 (2 tasks per local[32] core).
    def write(df: DataFrame, name: String, baseFiles: Int): Unit = {
      val n = math.max(baseFiles, math.min(64, baseFiles * copies / 4))
      df.repartition(n).write.mode("overwrite").parquet(s"$out/$name.parquet")
    }

    // fixed dims
    write(spark.read.parquet(s"$src/region.parquet"), "region", 1)
    write(spark.read.parquet(s"$src/nation.parquet"), "nation", 1)

    val customer = spark.read.parquet(s"$src/customer.parquet")
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val part = spark.read.parquet(s"$src/part.parquet")
    val supplier = spark.read.parquet(s"$src/supplier.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val ckOff = off(customer, "c_custkey")
    val okOff = off(orders, "o_orderkey")
    val pkOff = off(part, "p_partkey")
    val skOff = off(supplier, "s_suppkey")

    write(rep(customer).select(shifted("c_custkey", ckOff), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer", 2)
    write(rep(supplier).select(shifted("s_suppkey", skOff), col("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier", 1)
    write(rep(part).select(shifted("p_partkey", pkOff), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")), "part", 2)
    write(rep(orders).select(shifted("o_orderkey", okOff), shifted("o_custkey", ckOff),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders", 4)
    write(rep(lineitem).select(shifted("l_orderkey", okOff), shifted("l_partkey", pkOff),
      shifted("l_suppkey", skOff), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")), "lineitem", 8)

    // events: older driver corpora write ts as TIMESTAMP(NANOS) (read as
    // int64 via the nanosAsLong conf), newer ones as TIMESTAMP(µs).
    // Either way the scaled corpus carries a true TIMESTAMP(µs) column so
    // both engines keep the driver corpus's logical schema — a raw int64
    // ts would read as BIGINT in DuckDB and break interval arithmetic
    // in the oracle SQL at scaled dirs. Tables.events accepts either.
    val events = spark.read.parquet(s"$src/events.parquet")
    val evOff = off(events, "event_id")
    val usOff = off(events, "user_id")
    val tsUs =
      if (events.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts DIV 1000")).as("ts")
      else col("ts")
    write(rep(events).select(shifted("event_id", evOff), tsUs,
      shifted("user_id", usOff), col("event_type"), col("value"), col("props")), "events", 2)

    // documents: content-hashed 1-in-3 token salting for copies > 0
    val documents = spark.read.parquet(s"$src/documents.parquet")
    val dOff = off(documents, "doc_id")
    val salted = when(col("cp") === 0, col("text")).otherwise(
      array_join(transform(split(col("text"), " "),
        t => when(pmod(hash(t), lit(3)) === 0,
          concat(t, lit("~"), col("cp"))).otherwise(t)), " "))
    write(rep(documents).select(shifted("doc_id", dOff), salted.as("text"),
      col("lang"), col("source"), length(salted).cast("long").as("n_chars")), "documents", 2)

    // embeddings: seeded gaussian perturbation (total noise norm ≈ 1.5
    // on unit parents), renormalized — shared generator with the
    // clustered-σ variant
    scaleEmbeddings(spark, src, out, copies, 1.5)
  }
}
