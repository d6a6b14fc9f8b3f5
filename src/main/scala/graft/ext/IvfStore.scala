package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Stored statistics for [[IvfStore]]: live `cells`, vector `dims`, and
  * the (advisory) total vector count. */
final case class IvfStoreStats(cells: Int, dims: Int, vectors: Long)

/** PERSISTED IVF ANN index — [[IvfIndex]]'s session-lifetime model made a
  * stored layout, completing the index-maintenance story across the
  * modalities ([[NearDupIndex]] near-dup text, [[SubstrIndex]] verbatim
  * windows, this for embeddings): centroids are trained ONCE
  * ([[IvfIndex.fit]] — the oracle-exact Lloyd's), the assignment relation
  * is written to disk, and later vector batches are assigned to the
  * FROZEN centroids and appended under [[ManifestLog]] marker commits —
  * the standard production IVF contract (FAISS `add` after `train`):
  * append is map-only against the stored centroid matrix, never a refit.
  *
  * == Layout ==
  *  - `centroids/`           (cell, c: array<double>) — k driver-sized rows,
  *    written once at create (frozen thereafter; a refit is a new index);
  *  - `assigned/append=<id>/cell=<c>/` (vid, emb, nrm) — the vector
  *    relation, PARTITIONED BY CELL: a probe of `nprobe` cells reads
  *    `nprobe/cells` of the files, falling out of partition pruning
  *    rather than a runtime filter (the dq59 treatment applied to ANN);
  *  - `_commits/m<seq>`      marker manifests (crashed appends invisible);
  *  - `stats/`               one [[IvfStoreStats]] row (advisory).
  *
  * == Query shape ==
  * [[searchAll]] mirrors [[IvfIndex.queryAll]] stage for stage — query
  * rows pruned from the stored relation, probe cells ranked against the
  * driver-held centroids, broadcast, cell equi-join, bounded-heap top-k —
  * with the cached assignment replaced by the cell-partitioned scan.
  * Exactly-once appends via [[appendOnce]] tokens; a gate-style
  * `excludeToken` view gives replayed batches their original answer.
  */
final class IvfStore private (private val spark: SparkSession,
    val path: String, val centroids: Seq[(Int, Array[Double])]) {

  def stats: IvfStoreStats = {
    val r = spark.read.parquet(s"$path/stats").head()
    IvfStoreStats(r.getAs[Int]("cells"), r.getAs[Int]("dims"),
      r.getAs[Long]("vectors"))
  }

  private val log = new ManifestLog(spark, path)

  private def visible(excludeToken: Option[String]): Seq[Manifest] =
    log.read().filterNot(m => excludeToken.exists(m.token.contains))

  /** Active assigned dir ids: all published, minus any a later compaction
    * superseded. */
  private def activeIds(ms: Seq[Manifest]): Seq[String] = {
    val sup = ms.flatMap(_.supersedesDigests).toSet
    ms.flatMap(_.digests).filterNot(sup)
  }

  private def assignedRelOf(ms: Seq[Manifest]): DataFrame = {
    val ids = activeIds(ms)
    require(ids.nonEmpty, s"no committed assigned dirs under $path")
    // basePath anchors partition discovery when several append roots are
    // listed (each holding cell=<c> subdirs); only the manifest-listed
    // dirs are read, so the replay view is unaffected
    spark.read.option("basePath", s"$path/assigned")
      .parquet(ids.map(id => s"$path/assigned/append=$id"): _*)
  }

  /** Nearest STORED cell for an embedding column — the frozen-centroid
    * assignment every append rides (map-only; literal fold vs broadcast
    * kernel routed by k like every IVF surface). */
  private def cellOf(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(IvfIndex.probeCells(emb, centroids, 1, spark), 1)

  // ---------------- writes ----------------

  /** Append a vector batch: assign to the frozen centroids, write one
    * `append=<id>` dir partitioned by cell, one marker commit. */
  def append(df: DataFrame, idCol: String, embCol: String): IvfStoreStats =
    writeBatch(df, idCol, embCol, token = None)

  /** [[append]] with an idempotence token: a committed manifest carrying
    * `token` makes the call a no-op (micro-batch replay safe). */
  def appendOnce(df: DataFrame, idCol: String, embCol: String,
      token: String): IvfStoreStats = {
    require(token.nonEmpty && !token.contains("\n"), "token: non-empty, one line")
    if (log.read().exists(_.token.contains(token))) stats
    else writeBatch(df, idCol, embCol, token = Some(token))
  }

  private[ext] def writeBatch(df: DataFrame, idCol: String, embCol: String,
      token: Option[String]): IvfStoreStats = {
    val before = log.read()
    val seq = before.size + 1
    val id = f"a$seq%06d"
    df.select(col(idCol).as("vid"), col(embCol).as("emb"),
        VectorFunctions.l2Norm(col(embCol)).as("nrm"),
        cellOf(col(embCol)).as("cell"))
      .write.partitionBy("cell").mode("errorifexists")
      .parquet(s"$path/assigned/append=$id")
    val added = spark.read.parquet(s"$path/assigned/append=$id").count()
    log.commit(Manifest(Seq(id), Nil, Nil, Nil, token), seq)
    val prev = if (before.isEmpty) IvfStoreStats(centroids.size,
      centroids.head._2.length, 0L) else stats
    val st = IvfStoreStats(prev.cells, prev.dims, prev.vectors + added)
    IvfStore.writeStats(spark, path, st)
    maybeCompact()
    st
  }

  /** Rewrite the assigned dirs into one cell-partitioned relation once
    * the active dir count passes
    * `spark.graft.ivfstore.compactThreshold` (default 16) — bounds the
    * per-search file listing AND merges the per-cell small files that
    * per-append partitioning accumulates. The newest dir is never folded
    * (the token-replay window, as everywhere); superseded dirs stay on
    * disk for in-flight readers until [[vacuum]]. Row-identical: a
    * straight union rewrite, no re-assignment.
    */
  private def maybeCompact(): Unit = {
    val threshold = spark.conf
      .getOption("spark.graft.ivfstore.compactThreshold")
      .map(_.toInt).getOrElse(16)
    val ms = log.read()
    val foldable = activeIds(ms).dropRight(1)
    if (foldable.size > threshold) {
      val seq = ms.size + 1
      val cid = f"c$seq%06d"
      spark.read.option("basePath", s"$path/assigned")
        .parquet(foldable.map(id => s"$path/assigned/append=$id"): _*)
        .select("vid", "emb", "nrm", "cell")
        .write.partitionBy("cell").mode("errorifexists")
        .parquet(s"$path/assigned/append=$cid")
      log.commit(Manifest(Seq(cid), Nil, Nil, Nil, None, foldable), seq)
    }
  }

  /** Unlink assigned dirs a compaction superseded (single writer, once no
    * pre-compaction reader remains). Returns the number removed. */
  def vacuum(): Int = {
    val sup = log.read().flatMap(_.supersedesDigests).distinct
    val f = log.fileSystem
    sup.count { id =>
      f.delete(new org.apache.hadoop.fs.Path(s"$path/assigned/append=$id"), true)
    }
  }

  // ---------------- queries ----------------

  /** Top-k cosine neighbors for every stored query id —
    * [[IvfIndex.queryAll]]'s contract over the stored layout, with the
    * probe turned into a STATIC partition filter: the query rows are a
    * query-count-sized driver pull, their probe cells are ranked against
    * the driver-held centroids (bit-identical to [[IvfIndex.probeCells]]:
    * same left-to-right double fold as [[graft.functions.SquaredDistance]],
    * same (dist, cell) tie-break), and the candidate scan is filtered to
    * `cell IN (probed)` — a literal predicate on the PARTITION column, so
    * pruning happens at file listing (the dq59 class of evidence), not as
    * a runtime join filter. Output: (qid, vid, sim), top-k per qid.
    */
  def searchAll(queryIds: Seq[Long], topK: Int, nprobe: Int,
      excludeToken: Option[String] = None): DataFrame = {
    import spark.implicits._
    val assigned = assignedRelOf(visible(excludeToken))
    val qRows = assigned.filter(col("vid").isin(queryIds: _*))
      .select("vid", "emb", "nrm").collect()
    val probes = qRows.toSeq.flatMap { r =>
      val emb = r.getSeq[Float](1)
      nearestCellsDriver(emb, nprobe)
        .map(c => (r.getLong(0), emb, r.getDouble(2), c))
    }
    if (probes.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)]
        .toDF("qid", "vid", "sim")
    val probeDf = probes.toDF("qid", "qemb", "qnrm", "probe")
    val scored = assigned
      .where(col("cell").isin(probes.map(_._4).distinct: _*))
      .join(broadcast(probeDf),
        col("cell") === col("probe") && col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        (VectorFunctions.dot(col("emb"), col("qemb")) /
          (col("nrm") * col("qnrm"))).as("sim"))
    CandidateTopK.topPerQuery(scored, "sim", topK).select("qid", "vid", "sim")
  }

  /** The `nprobe` nearest stored cells for one query vector, computed on
    * the driver with EXACTLY the executor kernel's arithmetic (left-to-
    * right double accumulation of squared component deltas; ties to the
    * lower cell id). */
  private def nearestCellsDriver(emb: Seq[Float], nprobe: Int): Seq[Int] =
    centroids.map { case (cell, c) =>
      var acc = 0.0
      var i = 0
      val n = math.min(emb.length, c.length)
      while (i < n) {
        val d = emb(i).toDouble - c(i)
        acc += d * d
        i += 1
      }
      (acc, cell)
    }.sortBy(identity).take(nprobe).map(_._2)
}

object IvfStore {

  /** Train on `df` ([[IvfIndex.fit]] — oracle-exact Lloyd's), then write
    * the layout at `path` (must be fresh): centroids, the first assigned
    * append, stats, one commit. */
  def create(df: DataFrame, idCol: String, embCol: String, path: String,
      k: Int, iters: Int = 2): IvfStore = {
    val spark = df.sparkSession
    val idx = IvfIndex.fit(df, idCol, embCol, k, iters)
    try {
      import spark.implicits._
      val store = new IvfStore(spark, path, idx.centroids)
      require(store.log.read().isEmpty,
        s"$path already holds a committed index (create() wants a fresh path)")
      idx.centroids.map { case (cell, c) => (cell, c.toSeq) }
        .toDF("cell", "c")
        .coalesce(1).write.mode("errorifexists").parquet(s"$path/centroids")
      // the fit already computed the assignment; persist ITS rows rather
      // than re-assigning (bit-identical either way — same centroids)
      idx.assigned.select("vid", "emb", "nrm", "cell")
        .write.partitionBy("cell").mode("errorifexists")
        .parquet(s"$path/assigned/append=a000001")
      val n = spark.read.parquet(s"$path/assigned/append=a000001").count()
      store.log.commit(Manifest(Seq("a000001"), Nil, Nil, Nil, None), 1)
      writeStats(spark, path, IvfStoreStats(idx.centroids.size,
        idx.centroids.head._2.length, n))
      store
    } finally idx.release()
  }

  /** Open a stored index: centroids re-read driver-side (k rows). */
  def open(spark: SparkSession, path: String): IvfStore = {
    val cs = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    require(cs.nonEmpty, s"no centroids under $path")
    new IvfStore(spark, path, cs)
  }

  private def writeStats(spark: SparkSession, path: String,
      st: IvfStoreStats): Unit = {
    import spark.implicits._
    Seq((st.cells, st.dims, st.vectors)).toDF("cells", "dims", "vectors")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }
}
