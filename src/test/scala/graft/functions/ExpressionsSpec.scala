package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftSpec

/** Custom codegen Catalyst expressions: DotProduct, SortedIntersectSize. */
class ExpressionsSpec extends GraftSpec {
  import spark.implicits._

  describe("LetterGini") {
    it("one-pass kernel equals the 26-translate spec formulation " +
       "bit-for-bit — including Unicode that a naive lower() would fold " +
       "INTO a-z (Kelvin sign, dotted I)") {
      val rnd = new scala.util.Random(42)
      val strings = Seq("", "a", "zzzz", "The quick brown Fox! 123",
        "aAbB cC", "!@#$%^ 987",
        "Kelvin K sign", "dotted İ I", "café Éclair") ++
        (1 to 200).map(_ =>
          rnd.alphanumeric.take(rnd.nextInt(80)).mkString + " ,.!?")
      val (kn, kg) = graft.ext.TextAnalysis.charDiversity($"t")
      val (sn, sg) = graft.ext.TextAnalysis.charDiversitySpec($"t")
      strings.toDF("t")
        .select(kn.as("kn"), kg.as("kg"), sn.as("sn"), sg.as("sg"))
        .as[(Double, Double, Double, Double)].collect()
        .foreach { case (knV, kgV, snV, sgV) =>
          knV shouldBe snV
          kgV shouldBe sgV // exact double equality — same fold order
        }
    }
  }

  describe("DotProduct") {
    it("float and double arrays, mixed") {
      val df = Seq((Seq(1f, 2f, 3f), Seq(4.0, 5.0, 6.0))).toDF("f", "d")
      df.select(DotProduct($"f", $"d")).as[Double].head() shouldBe 32.0
      df.select(DotProduct($"f", $"f")).as[Double].head() shouldBe 14.0
    }
    it("null elements contribute zero; shorter array bounds the loop") {
      Seq((Seq(Some(1.0), None, Some(3.0)), Seq(2.0, 5.0, 7.0, 9.0))).toDF("a", "b")
        .select(DotProduct($"a", $"b")).as[Double].head() shouldBe (2.0 + 21.0)
    }
    it("null array → null") {
      Seq((Option.empty[Seq[Double]], Seq(1.0))).toDF("a", "b")
        .select(DotProduct($"a", $"b").isNull).as[Boolean].head() shouldBe true
    }
    it("matches the higher-order-function formulation") {
      val df = Seq((Seq(0.1f, -2.5f, 3.75f, 8f), Seq(1.5f, 0.25f, -1f, 2f))).toDF("a", "b")
      val hof = df.select(aggregate(
        zip_with($"a".cast("array<double>"), $"b".cast("array<double>"), (x, y) => x * y),
        lit(0d), (acc, x) => acc + x)).as[Double].head()
      df.select(DotProduct($"a", $"b")).as[Double].head() shouldBe hof
    }
    it("rejects non-array inputs at analysis") {
      an[Exception] should be thrownBy
        Seq((1, 2)).toDF("a", "b").select(DotProduct($"a", $"b")).collect()
    }
  }

  describe("SortedIntersectSize") {
    it("counts common elements of sorted arrays") {
      Seq((Seq("a", "c", "e"), Seq("b", "c", "d", "e"))).toDF("x", "y")
        .select(SortedIntersectSize($"x", $"y")).as[Int].head() shouldBe 2
    }
    it("disjoint and empty") {
      Seq((Seq("a"), Seq("b"), Seq.empty[String])).toDF("x", "y", "z")
        .select(SortedIntersectSize($"x", $"y"), SortedIntersectSize($"x", $"z"))
        .as[(Int, Int)].head() shouldBe ((0, 0))
    }
    it("works on ints too") {
      Seq((Seq(1, 3, 5, 7), Seq(2, 3, 5, 8))).toDF("x", "y")
        .select(SortedIntersectSize($"x", $"y")).as[Int].head() shouldBe 2
    }
    it("agrees with array_intersect on sorted distinct arrays") {
      val df = Seq((
        Seq("ab", "cd", "ef", "gh", "ij"),
        Seq("cd", "ef", "zz"))).toDF("x", "y")
      val expected = df.select(
        org.apache.spark.sql.functions.size(array_intersect($"x", $"y"))).as[Int].head()
      df.select(SortedIntersectSize($"x", $"y")).as[Int].head() shouldBe expected
    }
  }

  describe("SQL registration (GraftFunctions)") {
    it("graft_dot and graft_sorted_intersect_size callable from spark.sql") {
      GraftFunctions.register(spark)
      Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b").createOrReplaceTempView("vecs")
      spark.sql("SELECT graft_dot(a, b) FROM vecs").as[Double].head() shouldBe 11.0
      Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
        .createOrReplaceTempView("sets")
      spark.sql("SELECT graft_sorted_intersect_size(x, y) FROM sets")
        .as[Int].head() shouldBe 2
    }
    it("graft_letter_gini callable from spark.sql") {
      GraftFunctions.register(spark)
      Seq("aabb").toDF("t").createOrReplaceTempView("lg")
      val (n, g) = spark.sql(
        "SELECT graft_letter_gini(t).n_letters, graft_letter_gini(t).gini FROM lg")
        .as[(Double, Double)].head()
      n shouldBe 4.0
      g shouldBe 0.5 // 1 - (0.5^2 + 0.5^2)
    }

    it("graft_subword_tokenize callable from spark.sql with a literal vocab") {
      GraftFunctions.register(spark)
      Seq("spark key").toDF("t").createOrReplaceTempView("swt")
      spark.sql(
        "SELECT graft_subword_tokenize(t, array('sp','ark','ke')) FROM swt")
        .as[Seq[String]].head() shouldBe Seq("sp", "ark", "ke", "?")
    }

    it("the quantized kernels are callable from spark.sql") {
      GraftFunctions.register(spark)
      Seq((Seq(0.5f, -0.5f, 1.0f), Seq(1.0f, 1.0f, -1.0f))).toDF("a", "b")
        .createOrReplaceTempView("qv")
      // q(a)=[64,-63,127], q(b)=[127,127,-127] → 64·127 − 63·127 − 127·127
      val want = 64L * 127 - 63L * 127 - 127L * 127
      spark.sql("SELECT graft_quantized_dot(a, b, 127) FROM qv")
        .as[Long].head() shouldBe want
      spark.sql(
        "SELECT graft_byte_dot(graft_quantize_bytes(a, 127), graft_quantize_bytes(b, 127)) FROM qv")
        .as[Long].head() shouldBe want
    }

    it("graft_hamming matches the HOF formulation and handles nulls") {
      GraftFunctions.register(spark)
      val df = Seq(
        (Seq(0, 1, 1, 0), Seq(0, 1, 0, 1)),
        (Seq(1, 1), Seq(1, 1))).toDF("a", "b")
      df.select(HammingDistance($"a", $"b")).as[Int].collect().toSeq shouldBe Seq(2, 0)
      df.createOrReplaceTempView("hd")
      spark.sql("SELECT graft_hamming(a, b) FROM hd").as[Int].collect().toSeq shouldBe Seq(2, 0)
      // HOF equivalence on 0/1 arrays (the SimHash shape)
      val hof = df.select(aggregate(zip_with($"a", $"b",
        (x, y) => when(x =!= y, 1).otherwise(0)), lit(0), (acc, x) => acc + x))
        .as[Int].collect().toSeq
      hof shouldBe Seq(2, 0)
      // null element counts as differing unless both null
      Seq((Seq(Some(1), None, None), Seq(Some(1), Some(0), None))).toDF("a", "b")
        .select(HammingDistance($"a", $"b")).as[Int].head() shouldBe 1
    }

    it("graft_vector_sum_micros callable as a SQL aggregate") {
      GraftFunctions.register(spark)
      Seq((1, Seq(1.5f, 2f)), (1, Seq(0.5f, 1f))).toDF("k", "v")
        .createOrReplaceTempView("vs")
      spark.sql("SELECT graft_vector_sum_micros(v) FROM vs GROUP BY k")
        .as[Seq[Long]].head() shouldBe Seq(2000000L, 3000000L)
    }
  }

  describe("jaccardSorted vs jaccard") {
    it("identical results on sorted inputs") {
      val df = Seq((Seq("a", "b", "c", "d"), Seq("b", "c", "x"))).toDF("x", "y")
      val j1 = df.select(graft.ext.MinHashLSH.jaccard($"x", $"y")).as[Double].head()
      val j2 = df.select(graft.ext.MinHashLSH.jaccardSorted($"x", $"y")).as[Double].head()
      j2 shouldBe j1
    }
  }
}
