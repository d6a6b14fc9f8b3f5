package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** The machine-checked coverage contract: the committed SURVEY_INDEX.md
  * must be EXACTLY what the live registry renders — a query added,
  * renamed or re-oracled without regenerating the index fails here. No
  * SparkSession needed: the render is registry + source-text only.
  */
class SurveyIndexSpec extends AnyFunSpec with Matchers {

  it("SURVEY_INDEX.md is the byte-exact render of the live registry " +
     "(regenerate with `sbt \"runMain graft.SurveyIndexGen\"`)") {
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY_INDEX.md")), "UTF-8")
    committed shouldBe SurveyIndex.render()
  }

  it("every registered query has a doc block, a unique dq number, and " +
     "an oracle entry (or is a deliberate rows-only query)") {
    val keys = SparkEntry.queries.keys.toSeq
    keys should not be empty
    // unique numbers: the table joins on them
    val nums = keys.map(_.stripPrefix("dq").takeWhile(_.isDigit).toInt)
    nums.distinct.size shouldBe nums.size
    // every query row in the rendered table carries a real doc block
    // (no '-' placeholders) — the scaladoc convention is load-bearing
    val table = SurveyIndex.render()
    table.linesIterator.count(_.startsWith("| ")) shouldBe keys.size + 1 // +header
    table.linesIterator.filter(_.startsWith("| "))
      .count(_.contains("| - |")) shouldBe 0
    // oracle coverage: every key is either fully SQL-gated or explicitly
    // rows-only; the driver treats missing oracle entries as the weaker
    // gate, so the count here is the honest number the index publishes
    val sqlGated = keys.count(SparkEntry.oracleSql.contains)
    sqlGated should be >= (keys.size - 2) // at most 2 rows-only, today 0
  }
}
