package graft.io

import graft.io.ProtoIngest._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Property tests for the proto3 wire decoder: random values round-trip,
  * field order doesn't matter, interleaved unknown fields never change the
  * result. Pure byte-level (no SparkSession). Raw ScalaCheck Gen with fixed
  * seeds (the scalatest-scalacheck bridge isn't in the offline cache).
  */
class ProtoWirePropertySpec extends AnyFunSpec with Matchers {

  private def forAll[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(7L + i)).foreach(body)
    }

  // -------------------------------------------------- encoder (test-side)
  private class W {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): W = {
      var n = v
      while ((n & ~0x7fL) != 0) { out.write(((n & 0x7f) | 0x80).toInt); n >>>= 7 }
      out.write(n.toInt); this
    }
    def tag(f: Int, w: Int): W = varint((f.toLong << 3) | w)
    def bytes: Array[Byte] = out.toByteArray
  }
  private def zz(n: Long): Long = (n << 1) ^ (n >> 63)

  private val msg = PMessage("m", Seq(
    PField(1, "id", PInt64),
    PField(2, "name", PString),
    PField(3, "delta", PSInt64),
    PField(4, "flag", PBool),
    PField(5, "score", PDouble),
    PField(6, "counts", PInt32, repeated = true)))

  private case class V(id: Long, name: String, delta: Long, flag: Boolean,
      score: Double, counts: List[Int])

  private val genV: Gen[V] = for {
    id <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    name <- Gen.oneOf(Gen.const(""), Gen.alphaNumStr.map(_.take(20)),
      Gen.const("üñïçødé ✓"))
    delta <- Gen.chooseNum(-1000000L, 1000000L)
    flag <- Gen.oneOf(true, false)
    score <- Gen.chooseNum(-1e9, 1e9)
    counts <- Gen.listOfN(3, Gen.chooseNum(0, 1000))
  } yield V(id, name, delta, flag, score, counts)

  /** Encode one field of v; packed toggles the repeated encoding. */
  private def encField(w: W, v: V, field: Int, packed: Boolean): Unit = field match {
    case 1 => w.tag(1, 0).varint(v.id)
    case 2 =>
      val b = v.name.getBytes("UTF-8")
      w.tag(2, 2).varint(b.length); w.out.write(b)
    case 3 => w.tag(3, 0).varint(zz(v.delta))
    case 4 => w.tag(4, 0).varint(if (v.flag) 1 else 0)
    case 5 =>
      w.tag(5, 1)
      val bits = java.lang.Double.doubleToLongBits(v.score)
      (0 until 8).foreach(i => w.out.write(((bits >>> (8 * i)) & 0xff).toInt))
    case 6 =>
      if (packed) {
        val p = new W(); v.counts.foreach(c => p.varint(c.toLong))
        val pb = p.bytes
        w.tag(6, 2).varint(pb.length); w.out.write(pb)
      } else v.counts.foreach(c => w.tag(6, 0).varint(c.toLong))
  }

  private def check(r: org.apache.spark.sql.Row, v: V): Unit = {
    r.getAs[Long]("id") shouldBe v.id
    // set-but-empty string coerces to null (the reference's :210 rule)
    Option(r.getAs[String]("name")) shouldBe
      (if (v.name.isEmpty) None else Some(v.name))
    r.getAs[Long]("delta") shouldBe v.delta
    r.getAs[Boolean]("flag") shouldBe v.flag
    r.getAs[Double]("score") shouldBe v.score
    r.getAs[Seq[Int]]("counts") shouldBe v.counts
  }

  it("random values round-trip, in any field order, packed or unpacked") {
    val gen = for {
      v <- genV
      order <- Gen.oneOf(Seq(1, 2, 3, 4, 5, 6).permutations.toSeq)
      packed <- Gen.oneOf(true, false)
    } yield (v, order, packed)
    forAll(gen) { case (v, order, packed) =>
      val w = new W()
      order.foreach(f => encField(w, v, f, packed))
      check(decodeBytes(w.bytes, msg), v)
    }
  }

  it("proto map<k,v> round-trips: last duplicate key wins, defaults apply") {
    val mmsg = PMessage("mm", Seq(
      PField(1, "id", PInt64),
      PField(2, "attrs", PMap(PString, PInt32))))
    def encEntry(w: W, k: String, v: Int): Unit = {
      val e = new W()
      val kb = k.getBytes("UTF-8")
      e.tag(1, 2).varint(kb.length); e.out.write(kb)
      e.tag(2, 0).varint(v.toLong)
      val eb = e.bytes
      w.tag(2, 2).varint(eb.length); w.out.write(eb)
    }
    val genEntries = for {
      es <- Gen.listOfN(4, for {
        k <- Gen.alphaNumStr.map(_.take(8))
        v <- Gen.chooseNum(0, 1000)
      } yield (k, v))
      dupFirst <- Gen.oneOf(true, false)
    } yield if (dupFirst && es.nonEmpty) es :+ ((es.head._1, es.head._2 + 1)) else es
    forAll(genEntries) { entries =>
      val w = new W()
      w.tag(1, 0).varint(7L)
      entries.foreach { case (k, v) => encEntry(w, k, v) }
      decodeBytes(w.bytes, mmsg).getAs[Map[String, Int]]("attrs") shouldBe
        entries.toMap // toMap keeps the LAST duplicate — proto3 map rule
    }
    // absent map decodes to {}
    decodeBytes(new W().tag(1, 0).varint(1L).bytes, mmsg)
      .getAs[Map[String, Int]]("attrs") shouldBe Map.empty
    // empty entry message: key/value take proto3 zero defaults ("" -> 0)
    val we = new W(); we.tag(2, 2).varint(0)
    decodeBytes(we.bytes, mmsg).getAs[Map[String, Int]]("attrs") shouldBe Map("" -> 0)
  }

  it("map schema derives MapType and unroll bounds recursive map values") {
    val mmsg = PMessage("mm", Seq(PField(1, "attrs", PMap(PString, PInt64))))
    val st = structTypeOf(mmsg)
    st("attrs").dataType shouldBe
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType, valueContainsNull = false)
    st("attrs").nullable shouldBe false
    lazy val rec: PMessage = PMessage("node", Seq(
      PField(1, "name", PString),
      PField(2, "children", PMap(PString, PNestedRec(rec)))))
    val bounded = unroll(rec, maxDepth = 2)
    // depth 2: the leaf level's recursive map field is dropped
    val lvl2 = bounded.fields(1).ptype.asInstanceOf[PMap]
      .value.asInstanceOf[PNested].msg
    lvl2.fields.map(_.name) shouldBe Seq("name")
  }

  it("unknown fields interleaved anywhere never change the result") {
    val gen = for {
      v <- genV
      junkAt <- Gen.choose(0, 6)
      junkKind <- Gen.choose(0, 2)
    } yield (v, junkAt, junkKind)
    forAll(gen) { case (v, junkAt, junkKind) =>
      val w = new W()
      (1 to 6).foreach { f =>
        if (f - 1 == junkAt) junkKind match {
          case 0 => w.tag(99, 0).varint(123456789L)              // varint
          case 1 => w.tag(98, 2).varint(3); w.out.write(Array[Byte](1, 2, 3)) // len-delim
          case 2 =>
            w.tag(97, 1)                                          // fixed64
            (0 until 8).foreach(_ => w.out.write(0xab))
        }
        encField(w, v, f, packed = true)
      }
      check(decodeBytes(w.bytes, msg), v)
    }
  }
}
