package graft

import graft.functions.{GraftFunctions, Hyperplanes, RollingMinHash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Property tests (r14 verdict #4) for the two codegen Expressions on
  * the banding hot path, against their literal formulations over
  * adversarial inputs the example specs don't reach:
  *
  *  - [[RollingMinHash]] vs a naive per-window recompute on strings
  *    mixing empty / single-char / shorter-than-window / repeated
  *    bytes / multi-byte UTF-8 (incl. supplementary-plane emoji, where
  *    UTF-16 code units and UTF-8 bytes disagree — the hash is defined
  *    over UTF-8 BYTES, so the reference shares that framing);
  *  - [[graft.functions.HyperplaneBandVals]] vs the literal
  *    sign-dot-pack over random quantized vectors (negative, zero,
  *    large components) across several (bands x bits) shapes, plus the
  *    NULL contracts (null element / wrong width / null array → NULL).
  */
object BandExprProps extends Properties("BandExprs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark

  // ---------------- RollingMinHash ----------------

  private def minhashRef(s: String, w: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    val p = 2147483647L
    val b = 131L
    val win = math.max(1, math.min(w, math.max(bytes.length, 1)))
    if (bytes.isEmpty) 0L
    else (0 to bytes.length - win).map { start =>
      bytes.slice(start, start + win).foldLeft(0L)((h, c) => (h * b + (c & 0xff)) % p)
    }.min
  }

  private val charGen: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\t", "\n"),
    2 -> Gen.oneOf("é", "ß", "中", "😀", "𐍈"), // 2..4-byte UTF-8
    1 -> Gen.const("aaaa")) // repeated runs -> equal window hashes
  private val textGen: Gen[String] = Gen.frequency(
    1 -> Gen.const(""),
    2 -> charGen, // shorter than any window
    7 -> Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString)))

  property("rollingMinHash equals the naive per-window recompute") =
    forAllNoShrink(textGen, Gen.oneOf(1, 2, 8, 16, 64)) { (s, w) =>
      import spark.implicits._
      val got = Seq(s).toDF("t")
        .select(RollingMinHash.rollingMinHash(col("t"), w)).head().getLong(0)
      val want = minhashRef(s, w)
      if (got != want) println(s"text=${s.take(60)} w=$w got=$got want=$want")
      got == want
    }

  // ---------------- HyperplaneBandVals ----------------

  private val qaGen: Gen[Vector[Long]] =
    Gen.listOfN(Hyperplanes.Dim, Gen.frequency(
      5 -> Gen.choose(-1000000L, 1000000L),
      2 -> Gen.const(0L),
      1 -> Gen.choose(-4000000000L, 4000000000L))).map(_.toVector)

  private def bandRef(qa: IndexedSeq[Long], bands: Int, bits: Int): Vector[Long] = {
    val planes = Hyperplanes.planes(bands * bits)
    Vector.tabulate(bands) { b =>
      (0 until bits).foldLeft(0L) { (acc, k) =>
        val dot = qa.zip(planes(b * bits + k)).map { case (a, p) => a * p }.sum
        if (dot > 0) acc | (1L << k) else acc
      }
    }
  }

  private val shapeGen: Gen[(Int, Int)] =
    Gen.oneOf((16, 8), (8, 12), (1, 1), (32, 4), (4, 16))

  property("hyperplaneBands equals the literal sign-dot-pack") =
    forAllNoShrink(Gen.listOfN(4, qaGen), shapeGen) { case (qas, (bands, bits)) =>
      import spark.implicits._
      val got = qas.zipWithIndex.map { case (qa, i) => (i.toLong, qa) }
        .toDF("id", "qa")
        .select(col("id"), GraftFunctions.hyperplaneBands(col("qa"), bands, bits))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      qas.zipWithIndex.forall { case (qa, i) =>
        val want = bandRef(qa, bands, bits)
        val ok = got(i.toLong) == want
        if (!ok) println(s"vec=$i bands=$bands bits=$bits got=${got(i.toLong)} want=$want")
        ok
      }
    }

  property("null element, wrong width, and null array band to NULL") =
    forAllNoShrink(qaGen, Gen.choose(0, Hyperplanes.Dim - 1)) { (qa, holeAt) =>
      val schema = StructType(Seq(StructField("id", LongType, false),
        StructField("qa", ArrayType(LongType, containsNull = true), true)))
      import scala.jdk.CollectionConverters._
      val rows = Seq(
        Row(0L, qa.map(Long.box).updated(holeAt, null: java.lang.Long)),
        Row(1L, qa.map(Long.box).take(Hyperplanes.Dim - 1)),
        Row(2L, null)).asJava
      val out = spark.createDataFrame(rows, schema)
        .select(col("id"), GraftFunctions.hyperplaneBands(col("qa"), 8, 8).as("bv"))
        .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
      out(0L) && out(1L) && out(2L)
    }
}
