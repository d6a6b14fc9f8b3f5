package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.functions._

/** Greedy longest-match subword tokenization: algorithm cases (longest-first
  * priority, multi-piece splits, unknown fallback, word boundaries), codegen
  * participation, and interpreted/codegen bit-parity.
  */
class SubwordTokenizeSpec extends GraftSpec {
  import spark.implicits._

  private val V = SubwordTokenize.DemoVocab

  private def tok(s: String, vocab: Seq[String] = V): Seq[String] =
    Seq(Tuple1(s)).toDF("s")
      .select(SubwordTokenize(col("s"), vocab).as("t"))
      .as[Seq[String]].collect().head

  it("keeps a full-word vocab entry whole (longest match wins over prefixes)") {
    // "ta", "tab", "ble" are all in the vocab as distractors
    tok("table") shouldBe Seq("table")
    tok("scan") shouldBe Seq("scan")
  }

  it("splits uncovered words into the longest matching pieces") {
    tok("spark") shouldBe Seq("sp", "ark")
    tok("customer") shouldBe Seq("cust", "omer")
    tok("query") shouldBe Seq("qu", "ery") // "ery"(3) beats "er"(2) at pos 2
    tok("small") shouldBe Seq("sm", "all") // "all"(3) beats "a"(1) at pos 2
  }

  it("emits '?' for an uncovered char and advances one char") {
    tok("key") shouldBe Seq("ke", "?") // 'y' deliberately uncovered
    tok("zzz", vocab = Seq("a")) shouldBe Seq("?", "?", "?")
  }

  it("never matches across a word boundary") {
    // "ta" + "ble" exist, but the space keeps the words separate
    tok("ta ble") shouldBe Seq("ta", "ble")
    tok("spark key a") shouldBe Seq("sp", "ark", "ke", "?", "a")
  }

  it("handles empty input and null") {
    tok("") shouldBe Seq.empty
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("s")
      .select(SubwordTokenize(col("s"), V).as("t")).collect().head
    r.isNullAt(0) shouldBe true
  }

  it("every tokenization tiles the input exactly once — each piece matches " +
      "at its position, '?' consumes one char (vocab-independent invariant)") {
    val rnd = new scala.util.Random(11)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val streams = (1 to 500).map { i =>
      (i, (0 to rnd.nextInt(4)).map(_ =>
        (0 until 1 + rnd.nextInt(10)).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString).mkString(" "))
    }
    val out = streams.toDF("i", "s")
      .select(col("i"), col("s"), SubwordTokenize(col("s"), V).as("t"))
      .as[(Int, String, Seq[String])].collect()
    out.length shouldBe 500
    out.foreach { case (_, stream, pieces) =>
      // replay the pieces against the concatenated word stream
      val flat = stream.replace(" ", "")
      var pos = 0
      pieces.foreach { p =>
        if (p == "?") pos += 1
        else {
          assert(flat.startsWith(p, pos), s"'$p' !@ $pos in '$flat'")
          pos += p.length
        }
      }
      pos shouldBe flat.length
    }
  }

  it("participates in codegen (no fallback) and matches interpreted eval") {
    val expr = SubwordTokenize(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true), V)
    val gen = expr.genCode(new CodegenContext)
    gen.code.toString should include("graft.functions.SubwordTokenize.tokenize")

    // random word streams over the vocab alphabet, incl. uncovered chars
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz?9"
    val rows = (1 to 300).map { i =>
      val words = (0 to rnd.nextInt(6)).map(_ =>
        (0 until 1 + rnd.nextInt(9)).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString)
      (i.toLong, words.mkString(" "))
    }
    val df = rows.toDF("id", "s")
      .select(col("id"), SubwordTokenize(col("s"), V).as("t"))
    def run(): Set[(Long, Seq[String])] = df.as[(Long, Seq[String])].collect().toSet
    val codegen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try run() shouldBe codegen
    finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}
