package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions.{dotF32, normF32}
import graft.sources.Tables

/** Native codegen'd vector expressions must be bit-identical to the
  * generic higher-order formulation (same left-to-right double fold)
  * and must survive both codegen and interpreted eval paths. */
class VectorExprsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("dotF32/normF32 match the higher-order formulation bit-for-bit") {
    val e = Tables.read(spark, sf, "embeddings").limit(100)
      .select($"vec_id", $"embedding")
    val hofDot = aggregate(zip_with($"embedding", $"embedding",
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val hofNorm = sqrt(aggregate(transform($"embedding",
      x => x.cast("double") * x.cast("double")), lit(0.0), (acc, x) => acc + x))
    val rows = e.select(
      dotF32($"embedding", $"embedding").as("native_dot"), hofDot.as("hof_dot"),
      normF32($"embedding").as("native_norm"), hofNorm.as("hof_norm")).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
      assert(java.lang.Double.compare(r.getDouble(2), r.getDouble(3)) == 0)
    }
  }

  test("expressions handle null arrays and hand-computed values") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val r = df.select(dotF32($"a", $"b").as("d"), normF32($"a").as("n")).collect()
    assert(r(0).getDouble(0) == 32.0)
    assert(math.abs(r(0).getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("BandKeysF32 matches the compositional bandKey form bit-for-bit") {
    import graft.similarity.Lsh
    val bands = 8; val r = 8; val dim = 64
    val e = Tables.read(spark, sf, "embeddings").limit(100)
    // compositional reference: per-plane literal dot + shift/sum
    val ref = org.apache.spark.sql.functions.array(
      (0 until bands).map(b => Lsh.bandKey($"embedding", b, r, dim)): _*)
    val rows = e.select(Lsh.bandKeys($"embedding", bands, r, dim).as("native"),
      ref.as("comp")).collect()
    assert(rows.length == 100)
    rows.foreach { row =>
      assert(row.getSeq[Int](0) == row.getSeq[Int](1))
    }
  }

  test("QuantizeE6/SumSqI64/NearestCentE6 match compositional + driver-side forms") {
    import graft.functions.VectorFunctions.{nearestCentE6, quantizeE6, sumSqI64}
    val e = Tables.read(spark, sf, "embeddings").limit(100)
      .select($"vec_id", $"embedding")
    // quantization parity vs the builtin floor form, per element
    val comp = transform($"embedding", x => floor(x.cast("double") * 1e6))
    val qrows = e.select(quantizeE6($"embedding").as("native"), comp.as("comp")).collect()
    qrows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // sumsq + packed argmin parity vs driver-side arithmetic
    val cents: Array[Array[Long]] = qrows.take(3).map(_.getSeq[Long](0).toArray)
    val rows = e.select(quantizeE6($"embedding").as("el"))
      .select($"el", sumSqI64($"el").as("ss"), nearestCentE6($"el", cents).as("packed"))
      .collect()
    rows.foreach { r =>
      val el = r.getSeq[Long](0)
      assert(r.getLong(1) == el.map(x => x * x).sum)
      val dists = cents.map(c => el.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      val best = dists.min
      val bestIdx = dists.indexOf(best) // first min = lowest index tie-break
      assert(r.getLong(2) == best * 16L + bestIdx)
    }
    // nulls propagate
    val nr = Seq(Option.empty[Array[Float]]).toDF("v")
      .select(quantizeE6($"v").as("q")).collect()
    assert(nr(0).isNullAt(0))
  }

  test("dimension mismatch is a runtime error, not a truncated dot") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(dotF32($"a", $"b")).head()
    }
    // unwrapped or wrapped in Spark's execution exception chain
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(6)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("dimension mismatch")))
  }

  test("non-float32 arrays are an analysis error, not silent garbage") {
    val ex = intercept[Exception] {
      spark.sql("SELECT dot_f32(array(1.0, 2.0), array(3.0, 4.0))").head()
    }
    assert(ex.getMessage.toLowerCase.contains("array<float>") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("GraftExtensions exposes dot_f32/norm_f32 to SQL sessions") {
    // TestSpark builds its session with
    // spark.sql.extensions=graft.functions.GraftExtensions — the same
    // config a deployed cluster would set
    val r = spark.sql(
      "SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d, " +
        "norm_f32(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }

  test("pair_counts: bit-parity with the exploded substring formulation, unicode-safe") {
    import org.apache.spark.sql.functions._
    // multibyte (2-, 3-, 4-byte UTF-8), repeats, singleton and empty
    val docs = Seq("ababa", "caf\u00e9s", "\u65e5\u672c\u8a9e\u65e5\u672c",
      "a\ud83d\ude00b\ud83d\ude00", "x", "").toDF("text")
    val viaExpr = docs.filter(length($"text") >= 2)
      .select(explode(graft.functions.TextFunctions.pairCounts($"text")).as(Seq("pair", "c")))
      .groupBy($"pair").agg(sum($"c").as("cnt"))
    val viaSubstring = docs.filter(length($"text") >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("cnt"))
    val a = viaExpr.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = viaSubstring.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a("ab") == 2L && a("ba") == 2L) // "ababa" -> ab,ba,ab,ba
    // TRUNCATED multi-byte tail (raw crawl bytes are unvalidated):
    // the pair view must clamp to the array, not read past its end
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val truncated = UTF8String.fromBytes(Array(0x61.toByte, 0xE6.toByte))
    val m = graft.functions.PairCounts(Literal(truncated, org.apache.spark.sql.types.StringType))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
    assert(m.numElements() == 1)
    assert(m.keyArray().getUTF8String(0).getBytes.toSeq ==
      Seq(0x61.toByte, 0xE6.toByte))
  }
}
