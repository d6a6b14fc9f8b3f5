package graft.plan

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Property tests (SURVEY §5.2 item 3): for random nested schemas and random
  * path subsets, the plan-time projected schema obeys the reference's rules —
  * exactly the selected leaves survive, nesting is preserved, children are
  * name-sorted, empty structs vanish unless explicitly selected.
  *
  * Pure plan-level (no SparkSession): [[PathProjection.projectedSchema]] is
  * deterministic schema algebra. Raw ScalaCheck `Gen` sampling with a fixed
  * seed (the scalatest-scalacheck bridge isn't in the offline cache).
  */
class ProjectionPropertySpec extends AnyFunSpec with Matchers {

  /** Deterministic forAll over a fixed-seed sample stream. */
  private def forAll[A](gen: Gen[A], n: Int = 50)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val leafTypes: Gen[DataType] =
    Gen.oneOf(LongType, IntegerType, DoubleType, StringType, BooleanType)

  private def genField(depth: Int, idx: Int): Gen[StructField] = for {
    name <- Gen.const(s"f${depth}_$idx")
    dt <- if (depth >= 2) leafTypes
          else Gen.frequency(
            3 -> leafTypes,
            1 -> Gen.lzy(genStruct(depth + 1)),
            1 -> Gen.lzy(genStruct(depth + 1)).map(st => ArrayType(st)))
  } yield StructField(name, dt, nullable = true)

  private def genStruct(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 4)
    fields <- Gen.sequence[List[StructField], StructField](
      (0 until n).map(i => genField(depth, i)))
  } yield StructType(fields)

  /** All leaf paths of a schema (a struct-valued path selects the subtree). */
  private def leafPaths(st: StructType, prefix: String = ""): List[String] =
    st.fields.toList.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType if s.fields.nonEmpty    => leafPaths(s, p)
        case ArrayType(s: StructType, _) if s.fields.nonEmpty => leafPaths(s, p)
        case _: StructType | ArrayType(_: StructType, _) => Nil // empty struct: unselectable
        case _                                     => List(p)
      }
    }

  private def collectLeaves(st: StructType, prefix: String = ""): List[String] =
    leafPaths(st, prefix)

  it("projecting a subset of leaf paths keeps exactly those leaves") {
    forAll(genStruct(0)) { schema =>
      val all = leafPaths(schema)
      if (all.nonEmpty) {
        val keep = all.zipWithIndex.filter(_._2 % 2 == 0).map(_._1) // deterministic subset
        val projected = PathProjection.projectedSchema(schema, keep)
        collectLeaves(projected).toSet shouldBe keep.toSet
      }
    }
  }

  it("children of every struct are sorted by name") {
    forAll(genStruct(0)) { schema =>
      def sortedEverywhere(st: StructType): Boolean = {
        val names = st.fields.map(_.name).toList
        names == names.sorted && st.fields.forall(f => f.dataType match {
          case s: StructType              => sortedEverywhere(s)
          case ArrayType(s: StructType, _) => sortedEverywhere(s)
          case _                          => true
        })
      }
      sortedEverywhere(PathProjection.projectedSchema(schema, Nil)) shouldBe true
    }
  }

  it("projection is idempotent: re-projecting the projected schema with the same paths is a no-op") {
    forAll(genStruct(0)) { schema =>
      val all = leafPaths(schema)
      if (all.nonEmpty) {
        val keep = all.take(1 + all.size / 2)
        val once = PathProjection.projectedSchema(schema, keep)
        PathProjection.projectedSchema(once, keep) shouldBe once
      }
    }
  }

  it("unknown paths always throw") {
    forAll(genStruct(0), 30) { schema =>
      an[IllegalArgumentException] should be thrownBy
        PathProjection.projectedSchema(schema, List("definitely_not_a_field_zz"))
    }
  }
}
