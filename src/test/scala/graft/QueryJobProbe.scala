package graft

/** TEST-SCOPE profiling main (the optimization rounds' measurement tool,
  * kept out of the library surface — r17 verdict #4): runs the named
  * declared queries through the Bench-identical noop sink with a
  * job-level listener, printing per-query job COUNT and summed job wall
  * alongside the query wall — the driver-overhead attribution for the
  * serial ingest-loop family, where job count (not data volume) is the
  * cost. With PROBE_SITES=1 every job's callsite chain prints too.
  *
  * Usage: sbt "Test/runMain graft.QueryJobProbe <name-substring>[,...]"
  */
object QueryJobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryJobProbe <names>")
    val subs = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-queryjobprobe")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
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
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(starts.remove(e.jobId))
            .foreach(s => jobs.add(System.nanoTime() - s))
      })
    def drain(): (Int, Double) = {
      var n = 0; var tot = 0L
      while (!jobs.isEmpty) { n += 1; tot += jobs.poll() }
      (n, tot / 1e9)
    }
    val names = SparkEntry.queries.keys.toList.sorted
      .filter(n => subs.exists(n.contains))
    for (pass <- 1 to 2; n <- names) {
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      System.gc()
      drain()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // let the last job-end event land
      val (nj, js) = drain()
      println(f"[queryprobe] pass$pass $n%-34s wall=$wall%7.2fs jobs=$nj%4d jobSec=$js%7.2f")
    }
  }
}
