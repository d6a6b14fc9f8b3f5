package graft.ext

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN index with TRAINED centroids — the data-adaptive
  * upgrade over [[Ann.signBucket]]'s fixed sign cells: k-means (seeded,
  * k-means|| init) learns the cell structure from the data, vectors are
  * assigned to their nearest centroid, and a query probes only the `nprobe`
  * cells whose centroids are closest to it.
  *
  * Scale shape: training samples/aggregates through MLlib's distributed
  * k-means; assignment is one model.transform projection; a query touches
  * ~nprobe/k of the corpus via a cell-id equi-filter that prunes to the
  * probed cells. Centroids live on the driver (k × dim floats — tiny) and
  * broadcast with the query.
  */
final class IvfIndex private (
    val model: KMeansModel,
    val assigned: DataFrame, // vid, emb, nrm, cell
    k: Int) extends Serializable {

  /** Release the cached cell assignment. The index caches `assigned` for its
    * own lifetime (every query scans it); call this when done with the index
    * so the blocks don't outlive it.
    */
  def release(): Unit = assigned.unpersist(blocking = false)

  /** Top-k cosine neighbors of `queryId` probing the `nprobe` nearest cells. */
  def query(queryId: Long, topK: Int, nprobe: Int): DataFrame = {
    val spark = assigned.sparkSession
    val qRow = assigned.filter(col("vid") === queryId)
      .select("emb", "nrm").head()
    val qEmb = qRow.getSeq[Float](0).toArray
    val qNrm = qRow.getDouble(1)

    // nearest centroids on the driver: k × dim — microscopic
    val cells = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val arr = c.toArray
        val dist = qEmb.zip(arr).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, dist)
      }
      .sortBy(_._2).take(nprobe).map(_._1)

    val qCol = typedLit(qEmb.toSeq)
    assigned
      .filter(col("cell").isin(cells.toIndexedSeq: _*) && col("vid") =!= queryId)
      .select(col("vid"),
        (VectorFunctions.dot(col("emb"), qCol) / (col("nrm") * lit(qNrm))).as("sim"))
      .orderBy(col("sim").desc, col("vid"))
      .limit(topK)
  }
}

object IvfIndex {

  /** Train centroids and assign every vector to its cell. Deterministic for
    * a fixed seed.
    */
  def fit(df: DataFrame, idCol: String, embCol: String, k: Int,
      seed: Long = 42L): IvfIndex = {
    val base = df.select(col(idCol).as("vid"), col(embCol).as("emb"),
      VectorFunctions.l2Norm(col(embCol)).as("nrm"),
      array_to_vector(col(embCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(base)
    val assigned = model.transform(base)
      .select(col("vid"), col("emb"), col("nrm"),
        col(model.getPredictionCol).as("cell"))
      .persist()
    new IvfIndex(model, assigned, k)
  }
}
