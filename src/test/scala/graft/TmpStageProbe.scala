package graft

import org.apache.spark.sql.functions._

/** THROWAWAY profiling main for the optimization round (not part of the
  * library surface; deleted before the round closes). Times each declared
  * stage of the dq135/dq153 chain per round on the sf0.1 slices. */
object TmpStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-tmpprobe")
    // job-level accounting: count + wall of every job between two marks
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(e.jobId, System.nanoTime())
          if (sys.env.get("PROBE_SITES").contains("1"))
            System.err.println(s"[jobsite] ${e.jobId} " +
              e.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | "))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(e.jobId)
          if (s != 0L) jobs.add((e.jobId.toLong, System.nanoTime() - s))
        }
      })
    def drainJobs(): (Int, Double) = {
      var n = 0; var tot = 0L
      while (!jobs.isEmpty) { val (_, d) = jobs.poll(); n += 1; tot += d }
      (n, tot / 1e9)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = graft.io.TempReaper.tempDir("graft-tmpprobe").toString
    val cfg =
      s"""{"table": "documents", "id": "doc_id", "text": "text",
        | "stages": [
        |   {"stage": "exact_dedup"},
        |   {"stage": "substr_gate", "path": "$base/ss", "k": 8, "maxDupWindows": 0},
        |   {"stage": "lm_gate", "path": "$base/lm", "loMicro": 20000},
        |   {"stage": "probe_gate", "path": "$base/qp"}]}""".stripMargin
    val b1 = docs.filter(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("text"))
    val b2 = docs.filter(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 2)
      .select(col("doc_id"), col("text"))
    for (iter <- 1 to 3) {
      val ibase = graft.io.TempReaper.tempDir(s"graft-tmpprobe$iter").toString
      val pipeline = graft.plan.CurationConfig.parse(
        cfg.replace(base, ibase))
      for ((b, r) <- Seq((b1, "r1"), (b2, "r2"))) {
        var df = b
        pipeline.stages.zipWithIndex.foreach { case (st, i) =>
          drainJobs()
          val t0 = System.nanoTime()
          val out = st.applyIn(sfDir)(df, "doc_id", "text",
            Some(s"cfg:$r:s${i + 1}"))
          val n = out.count()
          val t1 = System.nanoTime()
          Thread.sleep(50) // let the last job-end event land
          val (nj, js) = drainJobs()
          println(f"[stageprobe] it$iter $r stage ${i + 1} ${st.getClass.getSimpleName}%-20s kept=$n%6d  ${(t1 - t0) / 1e9}%6.2fs  jobs=$nj%3d jobSec=$js%6.2f")
          df = out
        }
      }
    }
  }
}
