package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over embedding columns (EXT).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact top-k vs a single query vector — broadcast
  *    the query, one scan, TakeOrderedAndProject (no global sort). The
  *    baseline, still linear in corpus size.
  *  - sign-bucket partitioning ([[signBucket]]): an IVF-style coarse
  *    quantizer using the sign pattern of the leading dimensions as the cell
  *    id. Candidates come from an equi-join on the bucket id — the N² pair
  *    space collapses to per-bucket blocks, and the join shuffles on a small
  *    int key. Deterministic and data-independent (no trained centroids), so
  *    any engine reproduces it exactly; recall/cost tunes via `dims`
  *    (2^dims cells).
  *
  * All vector math is Catalyst higher-order functions (codegen; see
  * [[VectorFunctions]]).
  */
object Ann {

  /** IVF-style cell id: integer from the sign bits of the first `dims`
    * components (component > 0 → 1).
    */
  def signBucket(embedding: Column, dims: Int = 4): Column =
    (0 until dims).map(i =>
      when(element_at(embedding, i + 1) > 0, lit(1 << (dims - 1 - i))).otherwise(lit(0)))
      .reduce(_ + _)

  /** Exact top-k neighbors of one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId).select(col(embCol).as("qv"))
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), VectorFunctions.cosine(col(embCol), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** In-bucket near-duplicate pairs above a cosine threshold.
    * Norms are computed once per vector before the join (and the bucketed
    * frame is tiny relative to the pair space), so each candidate pair costs
    * exactly one codegen'd dot product.
    */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String,
      dims: Int = 4, threshold: Double = 0.9): DataFrame = {
    val e = df.select(col(idCol).as("vid"), col(embCol).as("emb"),
      signBucket(col(embCol), dims).as("bucket"),
      VectorFunctions.l2Norm(col(embCol)).as("nrm"))
    val a = e.as("a")
    val b = e.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"),
        (VectorFunctions.dot(col("a.emb"), col("b.emb")) /
          (col("a.nrm") * col("b.nrm"))).as("sim"))
      .filter(col("sim") > threshold)
  }

  /** Probe cells for multi-probe search: the query's own cell plus every
    * cell at hamming distance 1 in sign-bit space (dims+1 cells total) —
    * recall recovered for vectors near a quantization boundary at the cost
    * of probing a few more (still tiny) cells.
    */
  def probeBuckets(bucket: Column, dims: Int): Column =
    array((bucket +: (0 until dims).map(b => bucket.bitwiseXOR(lit(1 << b)))): _*)

  /** Multi-probe variant of [[annTopK]]: candidates come from the query's
    * cell and all hamming-1 neighbor cells.
    */
  def annTopKMultiProbe(df: DataFrame, idCol: String, embCol: String,
      queryIds: Seq[Long], k: Int, dims: Int = 4): DataFrame = {
    val e = df.select(col(idCol).as("vid"), col(embCol).as("emb"),
      signBucket(col(embCol), dims).as("bucket"),
      VectorFunctions.l2Norm(col(embCol)).as("nrm"))
    val q = e.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("emb").as("qemb"), col("nrm").as("qnrm"),
        explode(probeBuckets(col("bucket"), dims)).as("probe"))
    val scored = e.join(broadcast(q),
        col("bucket") === col("probe") && col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        (VectorFunctions.dot(col("emb"), col("qemb")) /
          (col("nrm") * col("qnrm"))).as("sim"))
    CandidateTopK.rankedTopPerQuery(scored, "sim", k)
  }

  /** Approximate top-k per query id, probing only the query's own cell.
    * The query rows are broadcast; ranking is the bounded-heap
    * [[graft.plans.TopKPerKeyExec]] over in-bucket candidates (`rnk` is
    * computed over the O(qids·k) survivors — identical under the total
    * order; see [[CandidateTopK]]).
    */
  def annTopK(df: DataFrame, idCol: String, embCol: String,
      queryIds: Seq[Long], k: Int, dims: Int = 4): DataFrame = {
    val e = df.select(col(idCol).as("vid"), col(embCol).as("emb"),
      signBucket(col(embCol), dims).as("bucket"),
      VectorFunctions.l2Norm(col(embCol)).as("nrm"))
    val q = e.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("emb").as("qemb"), col("bucket").as("qbucket"),
        col("nrm").as("qnrm"))
    val scored = e.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        (VectorFunctions.dot(col("emb"), col("qemb")) /
          (col("nrm") * col("qnrm"))).as("sim"))
    CandidateTopK.rankedTopPerQuery(scored, "sim", k)
  }

  /** kNN majority-vote classification — the weak-labeling / label-audit
    * primitive of a training-data pipeline (label a new item, or flag a
    * labeled item whose neighbors disagree): for each query vector, the
    * EXACT k nearest by cosine (brute force against the broadcast query
    * set — the recall yardstick, like [[bruteForceTopK]]) vote with their
    * `labelCol`; ties break toward the smaller label, so the winner is
    * deterministic. Returns (qid, label, n_votes, best_sim).
    *
    * Shape at 100 TB: the query set broadcasts, the corpus is ONE scan
    * with a codegen'd dot product per (row, query), the k survivors per
    * query come out of the bounded-heap [[graft.plans.TopKPerKeyExec]] —
    * the exchange moves O(qids·k) rows, and the vote is an aggregation
    * over exactly those survivors. Swap the scored frame for an IVF/cell
    * candidate set (annTopK's join) when the corpus scan itself is the
    * bottleneck and approximate recall is acceptable.
    */
  def knnClassify(df: DataFrame, idCol: String, embCol: String,
      labelCol: String, queryPred: Column, k: Int): DataFrame = {
    val e = df.select(col(idCol).as("vid"), col(embCol).as("emb"),
      col(labelCol).as("label"), VectorFunctions.l2Norm(col(embCol)).as("nrm"))
    // the query set is declared by PREDICATE, not a collected id list — no
    // driver round-trip; it stays a (broadcast) subquery of the same plan
    val q = df.filter(queryPred)
      .select(col(idCol).as("qid"), col(embCol).as("qemb"),
        VectorFunctions.l2Norm(col(embCol)).as("qnrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), col("label"),
        (VectorFunctions.dot(col("emb"), col("qemb")) /
          (col("nrm") * col("qnrm"))).as("sim"))
    val topk = CandidateTopK.topPerQuery(scored, "sim", k)
    voteOver(topk)
  }

  /** CELL-PRUNED [[knnClassify]] (r6 directive #3) — the corpus×queries
    * product shrunk to corpus×(probed cells): corpus rows are assigned to
    * the `index`'s trained cells (map-only, shared centroid broadcast),
    * each query probes its `nprobe` nearest cells, and scoring/voting runs
    * only on in-cell candidates — [[IvfIndex.queryAll]]'s candidate shape
    * with the vote on top. Exact [[knnClassify]] stays the default (labels
    * want exactness); this is the triage form for large query workloads,
    * with the `CellPrunedSpec` planting showing the parity check to run.
    */
  def knnClassifyPruned(df: DataFrame, idCol: String, embCol: String,
      labelCol: String, queryPred: Column, k: Int,
      index: IvfIndex, nprobe: Int): DataFrame = {
    val spark = df.sparkSession
    val e = index.withCell(
      df.select(col(idCol).as("vid"), col(embCol).as("emb"),
        col(labelCol).as("label"),
        VectorFunctions.l2Norm(col(embCol)).as("nrm")), "emb")
    val q = df.filter(queryPred)
      .select(col(idCol).as("qid"), col(embCol).as("qemb"),
        VectorFunctions.l2Norm(col(embCol)).as("qnrm"),
        explode(index.probesFor(col(embCol), nprobe, spark)).as("probe"))
    val scored = e.join(broadcast(q),
        col("cell") === col("probe") && col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), col("label"),
        (VectorFunctions.dot(col("emb"), col("qemb")) /
          (col("nrm") * col("qnrm"))).as("sim"))
    voteOver(CandidateTopK.topPerQuery(scored, "sim", k))
  }

  /** Majority vote over a per-query top-k frame (qid, vid, label, sim):
    * (votes desc, label asc) — ties toward the smaller label.
    */
  private def voteOver(topk: DataFrame): DataFrame = {
    val votes = topk.groupBy("qid", "label")
      .agg(count(lit(1)).as("n_votes"), max(col("sim")).as("best_sim"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("n_votes").desc, col("label"))
    votes.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1).drop("__r")
  }
}
