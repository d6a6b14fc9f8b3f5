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

  /** EXACT integer milli-weights via Cramer's rule on BigInt
    * determinants — the INFERENCE form of the probe: `w_j` as the
    * rational `det_j / det` rounded half-up to milli-units, entirely in
    * integer arithmetic, so the scoring plan ([[score]]) is
    * engine-reproducible bit for bit (the DuckDB oracle re-derives the
    * same determinants in HUGEINT and the same floor-division rounding).
    * The sign is normalized (det > 0) first so the rounding direction is
    * identical on both sides. [[solve]] remains the floating-point
    * reference; milli-rounding its output would NOT be oracle-safe —
    * double rounding at .5 boundaries diverges across engines, exact
    * rationals cannot.
    */
  def milliWeights(moments: Map[String, Long]): Array[Long] = {
    val m = Array.tabulate(D, D) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      BigInt(moments(s"m_${lo}_$hi"))
    }
    val v = Array.tabulate(D)(i => BigInt(moments(s"v_$i")))
    def det4(a: Array[Array[BigInt]]): BigInt = {
      def det3(r: Seq[Int], c: Seq[Int]): BigInt =
        a(r(0))(c(0)) * (a(r(1))(c(1)) * a(r(2))(c(2)) - a(r(1))(c(2)) * a(r(2))(c(1))) -
        a(r(0))(c(1)) * (a(r(1))(c(0)) * a(r(2))(c(2)) - a(r(1))(c(2)) * a(r(2))(c(0))) +
        a(r(0))(c(2)) * (a(r(1))(c(0)) * a(r(2))(c(1)) - a(r(1))(c(1)) * a(r(2))(c(0)))
      (0 until 4).map { c =>
        val rest = (0 until 4).filterNot(_ == c)
        val term = a(0)(c) * det3(Seq(1, 2, 3), rest)
        if (c % 2 == 0) term else -term
      }.sum
    }
    val dt0 = det4(m)
    require(dt0 != 0, "singular moment matrix (no unique least-squares fit)")
    val sign = if (dt0 < 0) BigInt(-1) else BigInt(1)
    val dt = dt0 * sign
    def floorDiv(a: BigInt, b: BigInt): BigInt = { // b > 0
      val q = a / b
      if (a % b != 0 && a < 0) q - 1 else q
    }
    Array.tabulate(D) { j =>
      val repl = m.map(_.clone())
      for (i <- 0 until D) repl(i)(j) = v(i)
      val dj = det4(repl) * sign
      floorDiv(2000 * dj + dt, 2 * dt).toLong // round-half-up of 1000*dj/dt
    }
  }

  /** The probe's SCORE column over an x0..x3 feature frame: micro-unit
    * integer `Σ w_milli_j · x_milli_j` — a codegen'd integer dot product,
    * map-side only. */
  def score(milliWeights: Seq[Long]): org.apache.spark.sql.Column = {
    require(milliWeights.length == D, s"need $D weights")
    milliWeights.zipWithIndex
      .map { case (w, j) => lit(w) * col(s"x$j") }
      .reduce(_ + _).cast("long")
  }

  /** The quality GATE: per-document micro score under trained
    * milli-weights, kept iff score ≥ the corpus-mean score (exact integer
    * floor — one aggregate round-trip, the threshold-as-literal
    * aggregate-then-broadcast shape). Output: (idCol, score_micro, keep
    * ∈ {0,1}). Composes into curation pipelines like any other quality
    * signal (dq17/dq92/dq102). */
  def gate(df: DataFrame, idCol: String, textCol: String,
      milliWeights: Seq[Long]): DataFrame = {
    val scored = features(df, idCol, textCol)
      .withColumn("score_micro", score(milliWeights))
    CacheScope.withCached(scored) {
      val r = scored.agg(sum(col("score_micro")).cast("long"),
        count(lit(1))).head()
      val thr = Math.floorDiv(r.getLong(0), r.getLong(1))
      scored.select(col(idCol), col("score_micro"),
        (col("score_micro") >= thr).cast("long").as("keep"))
    }
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
