package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * The correctness gate hash-compares Spark results against a DuckDB
  * oracle. Floating-point aggregation is order-dependent (partial/final
  * hash aggregation sums partitions in nondeterministic order), so any
  * `sum(double)` can differ in the last ULP between engines — or between
  * two Spark runs. The fix is exact decimal arithmetic *inside* the
  * query: cast each input double to a fixed-scale decimal (both engines
  * round the binary double to the same nearest decimal), aggregate
  * exactly, and convert the exact result to double at the very end
  * (nearest-double conversion is deterministic and engine-independent).
  *
  * The oracle SQL mirrors the same casts, so results match bit-for-bit.
  */
object Exact {
  /** Input double → exact fixed-scale decimal. Scale 2 matches the money
    * columns of the synthetic corpus (prices, balances); scale 4 for
    * rates (discount, tax). */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Narrow decimal types so chained products stay under the 38-digit
    * decimal ceiling in BOTH engines (Spark silently drops scale past 38
    * when allowPrecisionLoss=true; DuckDB errors — keep widths small so
    * neither path triggers). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  def rate(c: Column): Column = c.cast(DecimalType(6, 4))
  /** Exact decimal literal 1.0000 for (1 - discount)-style factors. */
  val one: Column = lit(1).cast(DecimalType(5, 4))

  /** Exact decimal → double through the decimal's string form. A direct
    * decimal→double cast is NOT correctly rounded in every engine once
    * the scaled integer exceeds 2^53 (DuckDB divides two separately
    * rounded doubles), but decimal→string is exact in both engines and
    * string→double is correctly-rounded strtod in both — so this chain
    * is bit-identical cross-engine at any magnitude/scale. */
  def decToDouble(c: Column): Column = c.cast("string").cast("double")

  /** Exact decimal sum, surfaced as double (deterministic conversion). */
  def dsum(c: Column, scale: Int = 2): Column = decToDouble(sum(dec(c, scale)))

  /** Deterministic average: exact decimal sum divided by count in double
    * arithmetic (one double division — identical in any engine), instead
    * of the engine's own `avg` (whose intermediate typing differs between
    * Spark and DuckDB). */
  def davg(c: Column, scale: Int = 2): Column =
    decToDouble(sum(dec(c, scale))) / count(lit(1))

  /** Deterministic mean of COMPUTED doubles via scaled-integer sums.
    * The double→decimal cast (`dec(x, 9)`) is NOT cross-engine
    * identical at rounding boundaries: Spark rounds the double's
    * shortest decimal string HALF_UP while DuckDB rounds the exact
    * binary value — one element in ~128k hit such a boundary at sf0.1
    * (q_kmeans/q_sim_pq checksum drift ≈ 1e-9/count). Rounding
    * x·1e9 to an INTEGER agrees in both engines for every double: at
    * exact halves both round away from zero, and off the boundary the
    * shortest-repr round-trip cannot cross the exactly-representable
    * k+0.5. Overflow-safe to ~9e9 rows per group at |x| ≤ 1.
    * SQL mirror: CAST(sum(CAST(round(x * 1000000000.0) AS BIGINT))
    * AS DOUBLE) / 1000000000.0 / count(*)  — same division order. */
  def scaledMean(c: Column): Column =
    sum(round(c * lit(1e9)).cast("long")).cast("double") / lit(1e9) / count(lit(1))

  /** `l_extendedprice * (1 - l_discount)`-style revenue term, exact. */
  def revenue(price: Column, discount: Column): Column =
    money(price) * (one - rate(discount))

  /** Timestamp → canonical UTC string (cross-engine-stable output type).
    * Parquet timestamp physical types differ (ms vs ns) across the
    * corpus; strings avoid any precision/type drift in the compare. */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
