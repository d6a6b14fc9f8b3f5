package graft

import org.apache.spark.sql.functions._

import graft.ext.MinHashLSH

/** Scaling probe for the near-dup path: clones the sf0.1 documents table
  * Nx (light tail mutations; every 7th clone an exact copy) and times
  * MinHash+LSH end-to-end. Run:
  * `sbt "runMain graft.ScaleProbe 1 10"`. Evidence for PERF.md that the
  * banded design grows ~linearly in corpus size, not quadratically in pairs.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val ms = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val spark = GraftSession.get("graft-scale")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    // dense=true: clones keep ~97% shingle overlap → every clone family is
    // mutually near-dup (worst-case true-pair density, verification-bound).
    // dense=false (default): every 3rd token is rep-mutated → clones diverge
    // (realistic ~0.1% dup density, tests candidate-generation scaling).
    val dense = sys.env.get("SCALE_DENSE").contains("1")
    ms.foreach { m =>
      val mutated =
        if (dense) concat(col("text"), lit(" tail"), col("rep"))
        else array_join(transform(split(col("text"), " "),
          (t, i) => when(i % 3 === 0, concat(t, lit("u"), col("rep"))).otherwise(t)), " ")
      val df = base.crossJoin(spark.range(m.toLong).toDF("rep"))
        .select((col("doc_id") * m + col("rep")).as("doc_id"),
          when(col("rep") % 7 === 0, col("text")).otherwise(mutated).as("text"))
        .cache()
      val n = df.count()
      val (hashes, bands) = (
        sys.env.getOrElse("SCALE_HASHES", "16").toInt,
        sys.env.getOrElse("SCALE_BANDS", "4").toInt)
      System.err.println(s"[scale] m=$m corpus ready: $n docs")
      // stage timings: candidates vs verified output
      val t0 = System.nanoTime()
      val cand = MinHashLSH.candidatePairs(df, "doc_id", "text", hashes, bands).count()
      val t1 = System.nanoTime()
      val pairs = MinHashLSH.nearDupPairs(df, "doc_id", "text", hashes, bands, 0.8).count()
      val t2 = System.nanoTime()
      println(f"""{"probe":"minhash","m":$m,"docs":$n,"hashes":$hashes,"bands":$bands,"candidates":$cand,"cand_sec":${(t1 - t0) / 1e9}%.1f,"pairs":$pairs,"total_sec":${(t2 - t1) / 1e9}%.1f}""")
      df.unpersist()
      ()
    }
    // ANN probe: clone embeddings with small perturbations; the IVF lesson
    // is that cell count (2^dims) must scale with corpus size to keep
    // per-cell blocks bounded
    if (sys.env.get("SCALE_ANN").contains("1")) {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      for (m <- Seq(10, 50); dims <- Seq(4, 8)) {
        val df = emb.crossJoin(spark.range(m.toLong).toDF("rep"))
          .select((col("vec_id") * m + col("rep")).as("vec_id"),
            transform(col("embedding"),
              x => x + (col("rep") % 10).cast("float") * lit(0.01f)).as("embedding"))
          .cache()
        val n = df.count()
        val t0 = System.nanoTime()
        val k = graft.ext.Ann.annTopK(df, "vec_id", "embedding", Seq(1L, 2L, 3L), 5, dims).count()
        val t1 = System.nanoTime()
        println(f"""{"probe":"ann","vecs":$n,"dims":$dims,"topk_rows":$k,"sec":${(t1 - t0) / 1e9}%.1f}""")
        df.unpersist()
        ()
      }
    }
    spark.stop()
  }
}
