package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `graft_dec_ticks(x)`: the unscaled BIGINT of `CAST(x AS
  * DECIMAL(27,10))` — i.e. x in 1e-10 "ticks", rounded exactly the way
  * Spark's double→decimal cast rounds (HALF_UP over the SHORTEST
  * decimal representation, `BigDecimal.valueOf`), without the
  * `Double.toString` → `BigDecimal` parse → `setScale` → unscaled-
  * byte-array round trip per row.
  *
  * This is the ANN training tier's exact-mean workhorse: the centroid
  * aggregations sum these ticks as plain BIGINTs (codegen'd long adds
  * in the hash-aggregate buffer) instead of DECIMAL(27,10) (non-compact
  * Decimal — a BigDecimal allocation plus an unscaled-BigInteger
  * byte-array rewrite per row per dimension in the unsafe buffer), and
  * [[TicksMeanDouble]] rebuilds the exact decimal mean per GROUP. The
  * result doubles are bit-identical — property-proven against Spark's
  * own Cast in ExprProps over randoms and adversarial near-midpoint
  * values.
  *
  * Fast path: the double's exact value m·2^e is scaled by
  * 1e10 = 5^10·2^10 in 128-bit integer arithmetic (P = m·5^10;
  * T = P·2^(e+10) ticks) and rounded HALF_UP on the exact binary
  * value. That agrees with shortest-repr rounding unless T lies within
  * one ulp (= 5^10 in P-units — ulp(x)·1e10 = 5^10·2^(e+10) exactly)
  * of a half-integer tick boundary k+1/2, where the two roundings can
  * disagree; those rows (~2·5^10/2^(n-1) of values, ≈0.001% at
  * embedding magnitudes) defer to the BigDecimal reference. Proof
  * shape: the shortest repr r of d satisfies |r − d| ≤ ulp/2 and
  * HALF_UP is monotone, so round(r) ≠ round(d_exact) requires a
  * boundary strictly between them — impossible when d_exact is more
  * than one ulp from every boundary.
  *
  * Domain: NULL for NaN/±Inf (what the cast yields); throws for
  * |x| ≥ 1e17 (DECIMAL(27,10) overflow — the ANSI cast throws too)
  * and for |x| ≳ 9.2e8 (fits the decimal but not a BIGINT unscaled —
  * outside the embedding-scale domain this expression serves; loud,
  * never silent). */
case class DecTicks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dec_ticks"

  override def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
    else java.lang.Long.valueOf(DecTicks.ticks(d))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      s"""
         |if (Double.isNaN($d) || Double.isInfinite($d)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.DecTicks.ticks($d);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DecTicks =
    copy(child = newChild)
}

object DecTicks {
  private val F = 9765625L // 5^10: one ulp in P-units; 1e10 = F·2^10

  /** The BigDecimal reference — literally the cast's arithmetic:
    * shortest repr, setScale(10, HALF_UP), unscaled. */
  def slowTicks(d: Double): Long = {
    val bd = java.math.BigDecimal.valueOf(d)
      .setScale(10, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 27)
      throw new ArithmeticException(
        s"graft_dec_ticks: $d cannot be represented as DECIMAL(27,10)")
    try bd.unscaledValue.longValueExact
    catch {
      case _: ArithmeticException => throw new ArithmeticException(
        s"graft_dec_ticks: $d exceeds the BIGINT tick domain (needs |x| < ~9.2e8)")
    }
  }

  /** Unscaled DECIMAL(27,10) of a finite double. */
  def ticks(d: Double): Long = {
    if (d == 0.0) return 0L
    val neg = d < 0
    val a = math.abs(d)
    // beyond ~8e8 the 63-bit headroom thins — let BigDecimal arbitrate
    // (also covers the throw regions). Embeddings never get here.
    if (a >= 8e8) return slowTicks(d)
    val bits = java.lang.Double.doubleToLongBits(a)
    val be = (bits >>> 52).toInt
    val m =
      if (be == 0) bits & ((1L << 52) - 1)
      else (bits & ((1L << 52) - 1)) | (1L << 52)
    val e = if (be == 0) -1074 else be - 1075
    val n = -(e + 10) // a < 8e8 ⇒ e ≤ -23 ⇒ n ≥ 13; T = P / 2^n
    if (n >= 78) return 0L // T < 2^76.3/2^78 < 0.3 ticks, > 0.2 from any boundary
    val hi = Math.multiplyHigh(m, F)
    val lo = m * F // (hi, lo) = P = m·5^10 < 2^76.3, exact
    val k = n - 1 // half-integer grid spacing 2^k in P-units
    val nearBoundary =
      if (k <= 63) {
        val mask = if (k == 63) Long.MaxValue else (1L << k) - 1
        val rr = lo & mask // P mod 2^k (2^64 ≡ 0 mod 2^k)
        rr <= F || rr > mask - F
      } else {
        val rhi = hi & ((1L << (k - 64)) - 1)
        val nearZero = rhi == 0 && java.lang.Long.compareUnsigned(lo, F) <= 0
        val nearTop = rhi == ((1L << (k - 64)) - 1) &&
          java.lang.Long.compareUnsigned(lo, -F) >= 0
        nearZero || nearTop
      }
    if (nearBoundary) return slowTicks(d)
    val q =
      if (n <= 63) (hi << (64 - n)) | (lo >>> n)
      else hi >>> (n - 64)
    val roundBit =
      if (k <= 63) (lo >>> k) & 1L
      else (hi >>> (k - 64)) & 1L
    val t = q + roundBit
    if (neg) -t else t
  }
}

/** `graft_ticks_mean(s0, s1, s2, n)`: the exact DECIMAL mean rebuilt
  * from 21-bit-split tick sums — bit-identical to
  * `CAST(SUM(CAST(x AS DECIMAL(27,10))) AS DOUBLE) / COUNT(1)`.
  *
  * The three inputs are `SUM(t >> 42)`, `SUM((t >> 21) & 0x1FFFFF)`,
  * `SUM(t & 0x1FFFFF)` over per-row ticks t = [[DecTicks]](x): each
  * part is < 2^21 in magnitude, so the BIGINT sums are exact for up to
  * 2^42 (≈4.4e12) rows per group — beyond any training-sample group
  * this tier produces (the operators train on sampled slices at scale;
  * the bound is documented at the call sites). Recombination
  * Σt = (Σp0)·2^42 + (Σp1)·2^21 + Σp2 runs per GROUP in BigInteger,
  * and the final double is `new BigDecimal(Σt, 10).doubleValue / n` —
  * the very calls Spark's decimal-sum + cast-to-double path bottoms
  * out in, so rounding is identical by construction. */
case class TicksMeanDouble(p0: Expression, p1: Expression, p2: Expression,
    cnt: Expression) extends QuaternaryExpression {

  override def first: Expression = p0
  override def second: Expression = p1
  override def third: Expression = p2
  override def fourth: Expression = cnt

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four bigint arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ticks_mean"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    TicksMeanDouble.mean(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.plans.TicksMeanDouble.mean($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): TicksMeanDouble =
    copy(p0 = f, p1 = s, p2 = t, cnt = q)
}

object TicksMeanDouble {
  def mean(s0: Long, s1: Long, s2: Long, n: Long): Double = {
    val total = java.math.BigInteger.valueOf(s0).shiftLeft(21)
      .add(java.math.BigInteger.valueOf(s1)).shiftLeft(21)
      .add(java.math.BigInteger.valueOf(s2))
    new java.math.BigDecimal(total, 10).doubleValue() / n.toDouble
  }
}
