package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SquaredDistance

/** PRODUCT QUANTIZATION for similarity search (EXT) — the memory scale
  * path beyond scalar quantization: split each `dims`-float embedding
  * into `m` contiguous sub-vectors, learn a small k-means codebook PER
  * SUBSPACE, and store each vector as its `m` nearest-sub-centroid ids —
  * `m` small ints instead of `4·dims` bytes (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
  * PQ/ADC tier of the FAISS taxonomy). A query never reconstructs a
  * vector: its inner product against every sub-centroid is tabulated
  * ONCE (m·k driver-side doubles), and each stored code scores as m
  * table lookups + adds — Asymmetric Distance Computation.
  *
  * Everything is exactly engine-reproducible, the [[IvfIndex]] contract
  * applied per subspace: seeded-hash init (first k vectors by
  * `(md5(id), id)`), squared-L2 argmin with `(dist, cell)` tie-break,
  * micro-integer mean updates (`floor(x·1e6)` sums, two double
  * divisions), and ADC sums folded in fixed subspace order — so the full
  * train → encode → score → rank chain has a DuckDB oracle (dq162).
  *
  * 100 TB shape: training collects only `m·k` sub-centroids (driver-sized
  * model, like [[IvfIndex.fit]]); encoding is MAP-ONLY (all m argmins are
  * literal folds over one row — no shuffle, no join); the scored scan
  * moves `m` bytes per vector instead of `4·dims` (64× smaller at
  * dims=64/m=4), and ranking is the bounded-heap
  * [[graft.plans.TopKPerKeyExec]] — never a full sort. Compose with
  * [[IvfIndex]] cells for IVF-PQ (probe cells, then ADC inside them):
  * both sides are plain columns, so the composition is a filter.
  *
  * Reference anchor: the reference engine has no vector surface
  * (/root/reference/README.md:1-40 — proto→Avro projection only); this
  * module is the EXT training-data tier.
  */
object PqAnn {

  /** Per-subspace codebooks. `sub(j)` holds subspace j's surviving
    * `(cell, centroid)` pairs (empty Lloyd's cells die, so ids need not
    * be contiguous — lookups key on the id, never the position). */
  final case class Codebook(dims: Int, m: Int,
      sub: Vector[Seq[(Int, Array[Double])]]) {
    require(m >= 1 && dims % m == 0,
      s"dims=$dims must split evenly into m=$m subspaces")
    def subDim: Int = dims / m
  }

  private def sliceCol(embCol: Column, j: Int, subDim: Int): Column =
    slice(embCol, j * subDim + 1, subDim)

  /** Nearest sub-centroid id with the family's deterministic tie-break:
    * squared distance first, then cell id ([[IvfIndex.cellDistances]]'s
    * struct-min trick, literal-k formulation — PQ codebooks are small by
    * construction, so the plan-literal path always applies). */
  private def nearestSub(semb: Column,
      cents: Seq[(Int, Array[Double])]): Column =
    array_min(array(cents.map { case (id, c) =>
      struct(SquaredDistance(semb, typedlit(c.toSeq)).as("dist"),
        lit(id).as("cell"))
    }: _*)).getField("cell")

  /** Train the `m` codebooks — [[IvfIndex.fit]]'s exact arithmetic run
    * independently per sub-vector slice: the SAME seeded-hash init order
    * (ranked by `(md5(id), id)` — identical across subspaces, so one
    * pass serves all m), `iters` argmin/mean rounds with micro-integer
    * sums, empty cells dying. One persisted base, `iters·m + 1`
    * driver-sized collects (each ≤ k rows). */
  def fit(df: DataFrame, idCol: String, embCol: String, dims: Int,
      m: Int, k: Int, iters: Int = 2): Codebook = {
    require(k >= 1 && k <= 128,
      s"k=$k out of range [1, 128]: PQ codebooks are plan-literal")
    require(iters >= 1, "iters must be >= 1")
    val subDim = {
      val cb = Codebook(dims, m, Vector.fill(m)(Nil)) // validates dims % m
      cb.subDim
    }
    val base = df.select(col(idCol).as("vid"), col(embCol).as("emb"))
      .persist()
    // ONE init collect: the k seed vectors (full dims), sliced per
    // subspace on the driver — identical to per-subspace init because
    // the (md5(id), id) rank does not depend on the slice
    val seeds = base.select(col("vid"), col("emb"))
      .orderBy(md5(col("vid").cast("string")), col("vid"))
      .limit(k).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val books = (0 until m).map { j =>
      var cents: Seq[(Int, Array[Double])] = seeds.zipWithIndex.map {
        case (v, i) => (i, v.slice(j * subDim, (j + 1) * subDim))
      }.toSeq
      for (_ <- 1 to iters) {
        val upd = base
          .select(nearestSub(sliceCol(col("emb"), j, subDim), cents)
              .as("cell"),
            sliceCol(col("emb"), j, subDim).as("semb"))
          .groupBy("cell")
          .agg(graft.functions.VectorSumMicros.of(col("semb")).as("ms"),
            count(lit(1)).as("n"))
          .collect()
        cents = upd.map { r =>
          val n = r.getLong(2)
          (r.getInt(0), r.getSeq[Long](1).map(x => (x / 1000000.0) / n).toArray)
        }.toSeq.sortBy(_._1)
      }
      cents
    }.toVector
    base.unpersist(blocking = false)
    Codebook(dims, m, books)
  }

  /** Encode every vector as its `m` sub-centroid ids — `(vid,
    * codes array<int>)` in subspace order. MAP-ONLY either way (nothing
    * shuffles, nothing joins), routed like [[IvfIndex]]'s assignment:
    * when the TOTAL centroid count `m·k` fits the plan-literal budget
    * (`spark.graft.ivf.literalMaxK`), all m argmins are literal folds in
    * one projection; above it the projection would blow whole-stage
    * codegen's 64 KB method limit (a 16×16 codebook is 256 distance
    * folds — measured fallback to interpreted eval), so each subspace
    * argmin runs through the [[graft.functions.NearestCells]] broadcast
    * kernel instead — m small call-scoped broadcasts, bit-identical
    * cells. This is the relation a 100 TB deployment persists
    * (m bytes/vector). `keep` names input columns to carry through —
    * the IVF-PQ composition surface, where [[IvfIndex.withCell]]'s
    * coarse cell rides along so the scored scan can be probe-pruned. */
  def encode(df: DataFrame, idCol: String, embCol: String,
      cb: Codebook, keep: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val literalBudget =
      spark.conf.get(IvfIndex.LiteralMaxKConf, "128").toInt
    val subCode: Int => Column =
      if (cb.sub.map(_.size).sum <= literalBudget)
        j => nearestSub(sliceCol(col(embCol), j, cb.subDim), cb.sub(j))
      else
        j => graft.functions.NearestCells(
          sliceCol(col(embCol), j, cb.subDim),
          IvfIndex.bcMatrix(spark, cb.sub(j)),
          cb.sub(j).map(_._1).toArray, 1).getItem(0)
    df.select(col(idCol).as("vid") +:
      array((0 until cb.m).map(subCode): _*).as("codes") +:
      keep.map(col): _*)
  }

  /** ADC inner-product top-k over an encoded relation: for each query,
    * tabulate `dot(q_sub_j, centroid)` for every sub-centroid (m·k
    * driver doubles, each a fixed left-to-right fold over subDim terms),
    * then score every code row as the SUBSPACE-ORDERED sum of its m
    * table lookups — a binary add chain `((t0 + t1) + t2) + …`, the
    * exact order the oracle writes. ONE scan of `codes` serves every
    * query (the per-query scores ride an exploded struct array — no
    * per-query union re-planning the input); ranking is the
    * bounded-heap top-k (score desc, vid asc); self-matches drop when
    * the query id appears in the relation. Returns `(qid, vid, score)`.
    * Feed a MATERIALIZED codes relation (the persisted m-bytes/vector
    * table a deployment stores) — scoring should scan codes, not
    * re-encode the corpus. */
  def adcTopK(codes: DataFrame, cb: Codebook,
      queries: Seq[(Long, Array[Float])], topK: Int): DataFrame =
    rankScored(scoredRows(codes, cb, queries), topK)

  /** IVF-PQ: [[adcTopK]] restricted to each query's PROBED coarse cells
    * — the FAISS IndexIVFPQ shape (here without residual encoding: the
    * codebooks quantize raw vectors, the coarse index only prunes). The
    * code relation must carry the vector's coarse `cell`
    * ([[encode]]'s `keep` + [[IvfIndex.withCell]]); `probes` maps each
    * query id to its probe-cell list ([[IvfIndex.probesFor]]). The scan
    * touches ~nprobe/k of the corpus AND reads m bytes per candidate —
    * the two prunings compose multiplicatively, which is the whole
    * point of the layout at 100 TB. */
  def adcTopKProbed(codes: DataFrame, cb: Codebook,
      queries: Seq[(Long, Array[Float])], probes: Map[Long, Seq[Int]],
      topK: Int): DataFrame = {
    require(codes.columns.contains("cell"),
      "adcTopKProbed: the code relation must carry the coarse 'cell' " +
        "column (encode with keep = Seq(\"cell\") over IvfIndex.withCell)")
    queries.foreach { case (qid, _) => require(probes.contains(qid),
      s"adcTopKProbed: no probe cells for query $qid") }
    val probed = scoredRows(codes, cb, queries, keep = Seq("cell"))
      .filter(array_contains(
        element_at(typedlit(probes), col("qid")), col("cell")))
    rankScored(probed, topK).select(col("qid"), col("vid"), col("score"))
  }

  /** The shared ADC scoring scan: `(qid, vid, score [, keep…])`, one
    * pass over `codes` with the per-query score structs exploded. */
  private def scoredRows(codes: DataFrame, cb: Codebook,
      queries: Seq[(Long, Array[Float])],
      keep: Seq[String] = Nil): DataFrame = {
    require(queries.nonEmpty, "adcTopK: no query vectors")
    queries.foreach { case (_, q) => require(q.length == cb.dims,
      s"query dims ${q.length} != codebook dims ${cb.dims}") }
    val qScores = queries.map { case (qid, q) =>
      val score = (0 until cb.m).map { j =>
        val table: Map[Int, Double] = cb.sub(j).map { case (cell, c) =>
          var s = 0.0
          var i = 0
          while (i < cb.subDim) {
            s += q(j * cb.subDim + i).toDouble * c(i)
            i += 1
          }
          cell -> s
        }.toMap
        element_at(typedlit(table), col("codes").getItem(j))
      }.reduceLeft(_ + _)
      struct(lit(qid).as("qid"), score.as("score"))
    }
    codes
      .select(col("vid") +: explode(array(qScores: _*)).as("qs") +:
        keep.map(col): _*)
      .select(Seq(col("qs").getField("qid").as("qid"), col("vid"),
        col("qs").getField("score").as("score")) ++ keep.map(col): _*)
      .filter(col("vid") =!= col("qid"))
  }

  private def rankScored(scored: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    graft.plans.GraftPlans.ensureInstalled(scored.sparkSession)
    graft.plans.GraftPlans.topKPerKey(scored, Seq(col("qid")),
      Seq(col("score").desc, col("vid").asc), topK)
  }
}
