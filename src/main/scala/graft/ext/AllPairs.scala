package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via PREFIX FILTERING (the AllPairs/PPJoin
  * family — Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
  * WWW'07): a LOSSLESS candidate generator for Jaccard-thresholded pairs
  * that replaces the quadratic within-group self-join.
  *
  * The filter rests on two exact bounds for J(x,y) > t:
  *  - LENGTH: J ≤ min(|x|,|y|)/max(|x|,|y|), so |x| > t·|y| and |y| > t·|x|
  *  - PREFIX: order every set by one global total order and keep each set's
  *    first |s| − ⌈t·|s|⌉ + 1 tokens; any pair with J ≥ t shares at least
  *    one token within BOTH prefixes
  * Candidates = pairs sharing a prefix token (equi-join on the token) that
  * pass the length bound; exact Jaccard then verifies candidates only. No
  * qualifying pair is ever dropped, so results are identical to the
  * brute-force formulation — only cheaper.
  *
  * The global order is (document frequency ASC, token): rarest first, so
  * prefixes are made of the most selective tokens and the candidate join
  * key distribution is anti-correlated with token popularity — the property
  * that keeps bucket sizes bounded as the corpus grows. (Any total order is
  * correct; rarity is the one that scales.)
  *
  * Scale shape: one token-frequency aggregation, one per-set window to rank
  * tokens (shuffles token rows, ~|s|·N, not pairs), an equi-join on
  * (group, token) over PREFIX rows only, and verification joins on ids.
  * Nothing is ever N².
  */
object AllPairs {

  /** Lossless candidate pairs (idA < idB) for J > threshold, within
    * `groupCols` if non-empty. `setCol` must hold distinct-element arrays.
    */
  def candidatePairs(sets: DataFrame, idCol: String, setCol: String,
      groupCols: Seq[String], threshold: Double): DataFrame = {
    val grp = groupCols.map(col)
    val base = sets.select(
      (col(idCol).as("__id") +: col(setCol).as("__sh") +: grp): _*)
      .withColumn("__sz", size(col("__sh")))

    val tokens = base.select(
      (col("__id") +: col("__sz") +: explode(col("__sh")).as("__tok") +: grp): _*)
    val freq = tokens.groupBy("__tok").agg(count(lit(1)).as("__df"))

    // rank each set's tokens rarest-first; keep the prefix
    val w = Window.partitionBy(col("__id")).orderBy(col("__df"), col("__tok"))
    val prefix = tokens.join(freq, "__tok")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__sz") - ceil(lit(threshold) * col("__sz")) + 1)
      .select((col("__id") +: col("__sz") +: col("__tok") +: grp): _*)

    val a = prefix.as("a")
    val b = prefix.as("b")
    val groupCond = groupCols
      .map(g => col(s"a.$g") === col(s"b.$g"))
      .foldLeft(col("a.__tok") === col("b.__tok"))(_ && _)
    a.join(b, groupCond &&
        col("a.__id") < col("b.__id") &&
        // length bound: J > t forces min > t·max
        col("a.__sz") > lit(threshold) * col("b.__sz") &&
        col("b.__sz") > lit(threshold) * col("a.__sz"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
  }

  /** Verified pairs: (id_a, id_b, jac) with J > threshold — candidate
    * generation above, exact sorted-merge Jaccard
    * ([[MinHashLSH.jaccardSorted]]) on candidates only. `setCol` must hold
    * ASC-sorted distinct-element arrays.
    */
  def jaccardPairs(sets: DataFrame, idCol: String, setCol: String,
      groupCols: Seq[String], threshold: Double): DataFrame = {
    val cand = candidatePairs(sets, idCol, setCol, groupCols, threshold)
    val x = sets.select(col(idCol).as("id_a"), col(setCol).as("__sh_a"))
    val y = sets.select(col(idCol).as("id_b"), col(setCol).as("__sh_b"))
    cand.join(x, "id_a").join(y, "id_b")
      .select(col("id_a"), col("id_b"),
        MinHashLSH.jaccardSorted(col("__sh_a"), col("__sh_b")).as("jac"))
      .filter(col("jac") > threshold)
  }

  /** Size-adaptive verified pairs within groups: groups of ≤ `bruteMaxGroup`
    * members take the direct in-group self-join (pair count structurally
    * bounded by bruteMaxGroup·N — linear in corpus size for a fixed cap, and
    * free of the prefix machinery's fixed cost), larger groups take the
    * prefix-filtered path. Both branches are exact, so the union equals the
    * brute-force result for ANY cap — the cap tunes cost, never answers.
    *
    * This split is the production shape: prefix filtering only amortizes
    * once a group's quadratic pair space dwarfs a token-frequency pass, and
    * a skewed group-size distribution gets the right treatment per group.
    */
  def jaccardPairsAdaptive(sets: DataFrame, idCol: String, setCol: String,
      groupCols: Seq[String], threshold: Double,
      bruteMaxGroup: Int = 1000): DataFrame = {
    require(groupCols.nonEmpty, "adaptive split needs group columns; " +
      "use jaccardPairs for a global similarity join")
    // Classify groups with a driver-side count collect — PLANNING statistics
    // (O(groups) tiny rows, same spirit as AQE stats), NOT data movement.
    // Splitting with a joined-in count column instead corrupts downstream
    // size estimates (the planner then broadcasts the wide array sides of
    // the self-join) and leaves runtime-empty branch stages in the plan;
    // literal predicates keep each branch's plan identical to the one it
    // would have standalone, and an absent branch vanishes at plan time.
    val over = sets.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__gn"))
      .filter(col("__gn") > bruteMaxGroup)
      .select(groupCols.map(col): _*)
      .collect()
    val isLarge: Option[Column] = over.toSeq match {
      case Seq() => None
      case keys => Some(keys.map(r =>
        groupCols.zipWithIndex.map { case (g, i) => col(g) <=> lit(r.get(i)) }
          .reduce(_ && _)).reduce(_ || _))
    }

    def brute(df: DataFrame): DataFrame = {
      val a = df.as("a")
      val b = df.as("b")
      val cond = groupCols.map(g => col(s"a.$g") === col(s"b.$g"))
        .foldLeft(col(s"a.$idCol") < col(s"b.$idCol"))(_ && _)
      a.join(b, cond)
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
          MinHashLSH.jaccardSorted(col(s"a.$setCol"), col(s"b.$setCol")).as("jac"))
        .filter(col("jac") > threshold)
    }

    isLarge match {
      case None => brute(sets)
      case Some(pred) =>
        brute(sets.filter(!pred)).unionByName(
          jaccardPairs(sets.filter(pred), idCol, setCol, groupCols, threshold))
    }
  }
}
