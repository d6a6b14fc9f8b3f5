package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed LINEAR PROBE training over quality signals — the
  * normal-equations form of "train a cheap quality model on the corpus"
  * (the CCNet/RefinedWeb quality-filter shape, linearized): regress a
  * target signal (here dq92's integer LM-fluency score) on cheap surface
  * features, by
  *
  *   1. one corpus pass accumulating the moment statistics
  *      `M = Σ x·xᵀ` and `v = Σ x·y` (map-side partial sums — the ONLY
  *      corpus-sized work), then
  *   2. solving the d×d system `M·w = v` on the driver (model-sized,
  *      d = 4 here) — the aggregate-then-solve analogue of
  *      [[BpeTrain]]'s aggregate-then-argmax loop, with ONE pass instead
  *      of one per step because least squares has a closed form.
  *
  * Everything the cluster computes is INTEGER (milli-unit features,
  * micro-unit target, Long moment sums), so the oracle re-derives the
  * moment table bit-for-bit; only the driver-side solve is floating
  * point, and it is spec-checked against hand-built systems. At 100 TB
  * the moment pass rides the scan (no shuffle wider than d² partial
  * aggregates); Long is exact to 2⁶³ — beyond it, route the sums through
  * DECIMAL(38,0) at the same plan shape.
  *
  * Features (1-based positions in the weight vector after the intercept):
  * x0 = 1, x1 = mean token length (milli), x2 = stopword ratio (milli),
  * x3 = type-token ratio (milli — distinct tokens over tokens, the
  * repetition signal of the Gopher family) — quality signals restated in
  * exact integer arithmetic.
  */
object QualityProbe {

  /** Shared with the dq17 composite: the quality stopword list. */
  val Stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")

  /** (idCol, x0, x1, x2, x3) — integer-milli features per document. */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol),
        size(toks).cast("long").as("__nt"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("__sl"),
        size(filter(toks, t =>
          array_contains(array(Stopwords.map(lit): _*), t))).cast("long").as("__ns"),
        size(array_distinct(toks)).cast("long").as("__nd"))
      .select(col(idCol),
        lit(1L).as("x0"),
        expr("CASE WHEN __nt = 0 THEN 0 ELSE (1000 * __sl) DIV __nt END").as("x1"),
        expr("CASE WHEN __nt = 0 THEN 0 ELSE (1000 * __ns) DIV __nt END").as("x2"),
        expr("CASE WHEN __nt = 0 THEN 0 ELSE (1000 * __nd) DIV __nt END").as("x3"))
  }

  private val D = 4
  private def xs = (0 until D).map(i => s"x$i")

  /** The moment table off a frame carrying x0..x3 and `yCol`:
    * one row per upper-triangle `m_i_j = Σ xᵢ·xⱼ` plus `v_i = Σ xᵢ·y`,
    * value BIGINT — ONE aggregation job, partial-combined map-side. */
  def moments(features: DataFrame, yCol: String): DataFrame = {
    val sums =
      (for (i <- 0 until D; j <- i until D)
        yield sum(col(s"x$i") * col(s"x$j")).cast("long").as(s"m_${i}_$j")) ++
      (0 until D).map(i => sum(col(s"x$i") * col(yCol)).cast("long").as(s"v_$i"))
    val row = features.agg(sums.head, sums.tail: _*)
    // single row → (term, value) rows via stack, stable term ordering
    val terms = (for (i <- 0 until D; j <- i until D) yield s"m_${i}_$j") ++
      (0 until D).map(i => s"v_$i")
    row.selectExpr(s"stack(${terms.size}, " +
      terms.map(t => s"'$t', $t").mkString(", ") + ") AS (term, value)")
  }

  /** Solve `M·w = v` from a collected moment table (Gaussian elimination
    * with partial pivoting — d=4, driver-side, the model-sized step). */
  def solve(moments: Map[String, Long]): Array[Double] = {
    val a = Array.tabulate(D, D) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      moments(s"m_${lo}_$hi").toDouble
    }
    val b = Array.tabulate(D)(i => moments(s"v_$i").toDouble)
    for (c <- 0 until D) {
      val p = (c until D).maxBy(r => math.abs(a(r)(c)))
      require(math.abs(a(p)(c)) > 1e-9, s"singular moment matrix at column $c")
      if (p != c) { val t = a(p); a(p) = a(c); a(c) = t
        val tb = b(p); b(p) = b(c); b(c) = tb }
      for (r <- c + 1 until D) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c until D) a(r)(k) -= f * a(c)(k)
        b(r) -= f * b(c)
      }
    }
    val w = new Array[Double](D)
    for (i <- (D - 1) to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until D) s -= a(i)(j) * w(j)
      w(i) = s / a(i)(i)
    }
    w
  }
}
