package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE_IVF evidence at LARGE k (k=1024, ~100× the dq51 cell count): the
  * scale regime where the centroid plan-literal stops being viable and
  * [[IvfIndex]] routes assignment through the broadcast
  * [[graft.functions.NearestCells]] kernel.
  *
  * Emits one JSON line with
  *  - fit + batched-query walls for a k=1024 index over the cloned corpus
  *    (the kernel path engages automatically: 1024 > literalMaxK)
  *  - one-pass assignment walls for all three formulations — literal fold,
  *    broadcast kernel, broadcast-join + heap argmin — on a subset sized so
  *    the literal path (which at this k compiles a ~65k-node expression or
  *    falls back to interpreted eval) terminates in probe time
  *  - pairwise mismatch counts between the three assignments (expect 0 —
  *    the bit-parity contract at the k the spec suite cannot afford)
  *
  * Invoked from [[graft.ScaleProbe]] under `SCALE_IVFK=1`; lives in `ext`
  * because the per-path assignment surfaces are `private[ext]`.
  */
object IvfScaleProbe {

  def run(spark: SparkSession, m: Int = 50, k: Int = 1024): String = {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val df = emb.crossJoin(spark.range(m.toLong).toDF("rep"))
      .select((col("vec_id") * m + col("rep")).as("vec_id"),
        transform(col("embedding"),
          x => x + (col("rep") % 10).cast("float") * lit(0.01f)).as("embedding"))
      // the 2000-row base parquet is ONE split; without this the cloned
      // corpus sits in one partition and every "wall" below is single-core
      .repartition(64)
      .cache()
    val n = df.count()

    val t0 = System.nanoTime()
    val index = IvfIndex.fit(df, "vec_id", "embedding", k = k)
    val t1 = System.nanoTime()
    val liveCells = index.centroids.size
    val qids = (1L to 100L).map(_ * m)
    val rows = index.queryAll(qids, topK = 10, nprobe = 8).count()
    val t2 = System.nanoTime()

    // one-pass assignment comparison on a literal-affordable subset
    val sub = df.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("vid"), col("embedding").as("emb")).cache()
    val subN = sub.count()
    def timed(dfb: => org.apache.spark.sql.DataFrame): (Double, org.apache.spark.sql.DataFrame) = {
      val s = System.nanoTime()
      val out = dfb.select("vid", "cell").cache()
      out.count()
      ((System.nanoTime() - s) / 1e9, out)
    }
    val (litSec, litDf) = timed(IvfIndex.assignLiteral(sub, "emb", index.centroids))
    val (kerSec, kerDf) = timed(IvfIndex.assignKernel(sub, "emb", index.centroids))
    val (joinSec, joinDf) = timed(IvfIndex.assignViaJoin(sub, "emb", "vid", index.centroids))
    val mLitKer = litDf.except(kerDf).count() + kerDf.except(litDf).count()
    val mKerJoin = kerDf.except(joinDf).count() + joinDf.except(kerDf).count()

    // kernel vs join at FULL corpus width — the exchange-cost evidence
    val full = df.select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val s1 = System.nanoTime()
    IvfIndex.assignKernel(full, "emb", index.centroids).select(max("cell")).collect()
    val s2 = System.nanoTime()
    IvfIndex.assignViaJoin(full, "emb", "vid", index.centroids).select(max("cell")).collect()
    val s3 = System.nanoTime()

    Seq(litDf, kerDf, joinDf, sub).foreach(_.unpersist(blocking = false))
    index.release()
    df.unpersist(blocking = false)

    f"""{"probe":"ivf_k1024","vecs":$n,"k":$k,"live_cells":$liveCells,""" +
      f""""fit_sec":${(t1 - t0) / 1e9}%.1f,"queries":${qids.size},"topk_rows":$rows,""" +
      f""""query_sec":${(t2 - t1) / 1e9}%.1f,"parity_subset":$subN,""" +
      f""""assign_literal_sec":$litSec%.1f,"assign_kernel_sec":$kerSec%.1f,""" +
      f""""assign_join_sec":$joinSec%.1f,"mismatch_lit_kernel":$mLitKer,""" +
      f""""mismatch_kernel_join":$mKerJoin,""" +
      f""""full_assign_kernel_sec":${(s2 - s1) / 1e9}%.1f,""" +
      f""""full_assign_join_sec":${(s3 - s2) / 1e9}%.1f}"""
  }
}
