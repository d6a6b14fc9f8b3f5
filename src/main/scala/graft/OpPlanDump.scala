package graft

import org.apache.spark.sql.DataFrame

/** Operator-STAGE plan dumps for the optimization round's evidence files.
  *
  * Several declared queries collapse their heavy stages behind
  * call-scoped caches / localCheckpoints (the store-gate materialization
  * rule), so the returned frame's `explain` shows only the final
  * projection — the optimization happened in a stage the query-level dump
  * cannot see. This main dumps the PLAN OF THE STAGE ITSELF, before and
  * after shapes side by side where the old formulation is retained as an
  * executable spec (e.g. [[graft.ext.MediaDedup.cdcChunkRowsSpec]]).
  *
  * Usage: OpPlanDump <outDir> <op>[,<op>...]   (op: cdc_chunks, ...)
  */
object OpPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpPlanDump <outDir> <ops>")
    val outDir = args(0)
    val ops = args(1).split(",").toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-opplandump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def write(name: String, header: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        (header + "\n\n" + plan).getBytes("UTF-8"))
      System.err.println(s"[opplandump] wrote $name.txt")
    }

    if (ops("cdc_chunks")) {
      import org.apache.spark.sql.functions._
      val media = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          graft.ext.Multimodal.syntheticImagePayload(col("doc_id"))
            .as("payload"))
      write("op_cdc_chunks_before",
        "== cdc chunk-rows stage, BEFORE (Column HOF formulation — " +
          "retained as MediaDedup.cdcChunkRowsSpec, verbatim the shape " +
          "that shipped dq187) ==\n" +
          "note the per-position transform/filter/zip_with lambdas: " +
          "higher-order functions evaluate interpreted, one Md5.eval + " +
          "UTF8String substring per BYTE position",
        graft.ext.MediaDedup.cdcChunkRowsSpec(media, "doc_id", "payload",
          4, 2))
      write("op_cdc_chunks_after",
        "== cdc chunk-rows stage, AFTER (graft.functions.CdcChunks " +
          "kernel — one call per row, tight JVM loop, thread-local " +
          "MessageDigest; bit-identical by MediaCdcKernelSpec) ==",
        graft.ext.MediaDedup.cdcChunkRows(media, "doc_id", "payload",
          4, 2))
    }

    if (ops("shard_assign")) {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      write("op_shard_assign",
        "== ShardWriter.assign plan (r18 evidence for the r16 claim: " +
          "pack CARRIES the rows, so the document payload rides exactly " +
          "ONE Exchange — the stream-key repartition that IS the " +
          "placement move; the r18 change also folded the duplicate-id " +
          "refusal into this same pass, so no standalone keys-only " +
          "aggregation job runs per shard write) ==",
        graft.ext.ShardWriter.assign(docs, "doc_id", "text", "chars",
          4000, 1, 16))
    }

    if (ops("neardup_gate")) {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val path = graft.io.TempReaper.tempDir("graft-opdump-nd")
        .toString + "/idx"
      val idx = graft.ext.NearDupIndex.build(docs, "doc_id", "text", path)
      val batch = docs.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 400000).as("doc_id"), col("source"),
          concat(col("text"), lit(" zzztail")).as("text"))
        .localCheckpoint(true)
      write("op_neardup_gate",
        "== NearDupIndex gate plan (pairsPlanFor — the dq104/dq109/" +
          "dq141 per-cycle shuffle audit): exchanges are (1) incoming " +
          "repartition/shingle fan-out, (2) counts aggregation (tiny " +
          "partials), (3) band-key join of incoming keys vs stored " +
          "bands, (4) candidate-pair distinct, then the digest " +
          "verification joins — candidate-sized, AQE broadcasts them " +
          "at micro-batch scale. Every file scan lives under the index " +
          "path; history text is never read ==",
        idx.pairsPlanFor(batch, "doc_id", "text"))
    }
  }
}
