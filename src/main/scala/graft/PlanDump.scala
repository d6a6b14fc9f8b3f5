package graft

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization round's plan-evidence tool (`plans/r17/<query>_{before,
  * after}.txt`). Args: <outDir> <suffix> <name-substring>[,<substring>...]
  * Uses the same session/dataset wiring as Bench so the dumped plan is the
  * one the bench times (SPARK_GRAFT_SF_DIR, default sf0.1).
  *
  * Streaming / multi-action queries execute side effects during
  * construction (store seeds, micro-batch loops); their dumped plan is the
  * final returned frame's — stated in the file header so a reader knows
  * which part of the query the plan covers.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <names>")
    val outDir = args(0)
    val suffix = args(1)
    val subs = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-plandump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = SparkEntry.queries.keys.toList.sorted
      .filter(n => subs.exists(n.contains))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val header = s"== $n @ $sfDir ($suffix) ==\n" +
        "(plan of the returned frame; store-seeding/streaming side\n" +
        " effects execute during construction and are not in this plan)\n\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        (header + plan).getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote ${n}_$suffix.txt")
    }
  }
}
