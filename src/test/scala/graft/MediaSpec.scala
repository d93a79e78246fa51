package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media
import graft.multimodal.Media.{MediaDecoder, MediaEmbedding, MediaRow, MediaStats, StubDecoder}

/** Pins the [[Media.MediaDecoder]] injection contract: every mm
  * operator crosses the codec boundary through batched decoder calls
  * (one call per ≤batchSize rows, outputs 1:1 in order), results are
  * independent of batch boundaries, and a custom codec drops in
  * without touching the operators. */
class MediaSpec extends AnyFunSuite {
  import TestSpark._

  test("decode batch shape: one call per ≤batchSize rows, never per row") {
    MediaSpec.batchSizes.clear()
    val n = Media.mm1MediaStats(spark, sf, decoder = MediaSpec.Counting,
      batchSize = 64).count()
    val sizes = scala.jdk.CollectionConverters
      .CollectionHasAsScala(MediaSpec.batchSizes).asScala.toSeq
    assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 64))
    assert(sizes.sum == n, "decoder must see every row exactly once")
    // genuinely batched: far fewer calls than rows
    assert(sizes.length < n, s"${sizes.length} calls for $n rows — per-row decode")
  }

  test("results are batch-boundary independent") {
    def rows(bs: Int) = Media.mm1MediaStats(spark, sf, batchSize = bs)
      .collect().map(_.toString).sorted.toSeq
    assert(rows(7) == rows(64))
    def frames(bs: Int) = Media.mm2FrameSample(spark, sf, batchSize = bs)
      .collect().map(_.toString).sorted.toSeq
    assert(frames(5) == frames(64))
  }

  test("a custom codec drops in without touching the operators") {
    // a "real decoder" stand-in: fixed 512×512, one frame per KiB
    object FixedDims extends MediaDecoder {
      def decodeBatch(batch: Seq[MediaRow]): Seq[MediaStats] = batch.map { m =>
        MediaStats(m.doc_id, m.source, m.payload.length.toLong,
          if (m.payload.nonEmpty) m.payload(0) & 0xff else 0,
          width = 512, height = 512,
          n_frames = m.payload.length.toLong / 1024L + 1L)
      }
      def embedBatch(batch: Seq[MediaRow], dim: Int): Seq[MediaEmbedding] =
        batch.map(m => MediaEmbedding(m.doc_id,
          Array.fill(dim)(m.payload.length.toFloat)))
    }
    val stats = Media.mm1MediaStats(spark, sf, decoder = FixedDims).collect()
    assert(stats.nonEmpty && stats.forall(r =>
      r.getAs[Int]("width") == 512 && r.getAs[Int]("height") == 512))
    // mm6 consumes the injected dims: everything passes a 512-floor gate
    val f = Media.mm6MediaFilter(spark, sf, minWidth = 512, minHeight = 512,
      minFrames = 1L, decoder = FixedDims).collect()
    assert(f.nonEmpty && f.forall(r =>
      r.getAs[Long]("n_kept") == r.getAs[Long]("n_assets")))
    // mm3 rides embedBatch: norm of a constant-len vector is len·√dim
    val e = Media.mm3EmbedMedia(spark, sf, dim = 4, decoder = FixedDims).collect()
    e.take(20).foreach { r =>
      val norm = r.getAs[Double]("emb_norm")
      val e0 = r.getAs[Double]("e0")
      assert(math.abs(norm - e0 * 2.0) < 1e-3, s"norm $norm vs e0 $e0")
    }
    // mm10's declared-metadata zip survives a custom decoder (1:1
    // in-order outputs are the contract it leans on)
    val b = Media.mm10DecodeBudget(spark, sf, decoder = FixedDims, batchSize = 9)
      .collect()
    val base = Media.mm10DecodeBudget(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_objects"), r.getAs[Long]("total_bytes"),
          r.getAs[Long]("n_mismatch"))).toMap
    b.foreach { r =>
      val (n, tb, mm) = base(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_objects") == n)
      assert(r.getAs[Long]("total_bytes") == tb) // byte_len comes from real bytes both ways
      assert(r.getAs[Long]("n_mismatch") == mm)
      // frames DID change under the 1-per-KiB codec
      assert(r.getAs[Long]("total_frames") <= tb / 1024L + n)
    }
  }

  test("mm11 scene cuts: planted sharp jump is the one cut; uniform and single-frame assets are quiet") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mm11").toString
    val jumpy = "a" * 256 + "z" * 256        // two frames, mean 97 -> 122
    val flat = "m" * 600                     // three frames, identical means
    val shorty = "hello"                     // one frame: no transitions
    val drift = "a" * 256 + "a" * 200 + "c" * 56 // frame2 mean 97.44 - under tau=2
    Seq(
      (0L, jumpy, "en", "s0", jumpy.length.toLong),
      (1L, flat, "en", "s0", flat.length.toLong),
      (2L, shorty, "en", "s1", shorty.length.toLong),
      (3L, drift, "en", "s1", drift.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Media.mm11SceneCuts(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_frames") == 2 && r(0L).getAs[Long]("n_cuts") == 1
      && r(0L).getAs[Long]("n_scenes") == 2)
    assert(r(0L).getAs[Long]("max_jump_e6") == 25000000L) // |122-97| exactly
    assert(r(1L).getAs[Long]("n_frames") == 3 && r(1L).getAs[Long]("n_cuts") == 0)
    assert(r(1L).getAs[Long]("max_jump_e6") == 0L)
    assert(r(2L).getAs[Long]("n_frames") == 1 && r(2L).getAs[Long]("n_scenes") == 1)
    assert(r(2L).isNullAt(r(2L).fieldIndex("max_jump_e6"))) // no transition to measure
    // sub-threshold drift: measured but not cut
    assert(r(3L).getAs[Long]("n_cuts") == 0 && r(3L).getAs[Long]("max_jump_e6") > 0L)
    // join-free plan: explode + one lag window + one agg
    val plan = Media.mm11SceneCuts(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "mm11 must be join-free")
  }

  test("mm11 long-payload stress: a 1 MB asset tiles linearly (the CharGrams path)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mm11-big").toString
    // ~1 MB alternating blocks: 2048 frames, a cut at every block edge;
    // the old explode+substr tiling was quadratic in payload length
    val big = (0 until 2048).map(i => (if (i % 2 == 0) "a" else "z").toString * 256).mkString
    Seq((0L, big, "en", "s0", big.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Media.mm11SceneCuts(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_frames") == 2048L)
    assert(r.head.getAs[Long]("n_cuts") == 2047L) // every frame boundary jumps 25 codes
    assert(r.head.getAs[Long]("max_jump_e6") == 25000000L)
  }

  test("mm12 audio segments: planted silence gaps segment correctly; driver recompute agrees") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mm12").toString
    val gap = "z" * 64 + " " * 64 + "z" * 64   // speech | silence | speech
    val flat = "m" * 192                       // uniform: nothing below own mean
    val shorty = "hi"                          // one partial window
    val padded = "z" * 64 + " " * 32           // trailing silence pad (partial window)
    val deadish = "~" * 64 + " " * 320         // one live window, five dead
    val docs = Seq((0L, gap), (1L, flat), (2L, shorty), (3L, padded), (4L, deadish))
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Media.mm12AudioSegments(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // full driver recompute of the contract: 64-byte windows, silence =
    // per-byte energy below 97% of the clip's own mean, islands of activity
    docs.foreach { case (id, t) =>
      val wins = t.grouped(64).toVector.map(w => (w.map(_.toLong).sum, w.length.toLong))
      val ts = wins.map(_._1).sum; val tl = wins.map(_._2).sum
      val sil = wins.map { case (s, l) => s * tl * 100 < 97 * ts * l }
      // run-lengths of activity (head of the list = current run)
      val runs = sil.foldLeft(List.empty[(Boolean, Long)]) {
        case ((s, n) :: rest, v) if s && !v => (true, n + 1) :: rest
        case (acc, v) => (!v, 1L) :: acc
      }.filter(_._1).map(_._2)
      val row = r(id)
      assert(row.getAs[Long]("n_windows") == wins.length.toLong, s"clip $id windows")
      assert(row.getAs[Long]("silent_windows") == sil.count(identity).toLong, s"clip $id silent")
      assert(row.getAs[Long]("n_segments") == runs.length.toLong, s"clip $id segments")
      assert(row.getAs[Long]("longest_seg") == (if (runs.isEmpty) 0L else runs.max), s"clip $id longest")
      val act = wins.length.toLong - sil.count(identity)
      assert(row.getAs[Long]("activity_ratio_e6") ==
        (2 * act * 1000000L + wins.length) / (2 * wins.length), s"clip $id ratio")
    }
    // the planted shapes actually exercised
    assert(r(0L).getAs[Long]("n_segments") == 2 && r(0L).getAs[Long]("silent_windows") == 1)
    assert(r(1L).getAs[Long]("n_segments") == 1 && r(1L).getAs[Long]("silent_windows") == 0)
    assert(r(2L).getAs[Long]("n_windows") == 1 && r(2L).getAs[Long]("activity_ratio_e6") == 1000000L)
    assert(r(3L).getAs[Long]("silent_windows") == 1 && r(3L).getAs[Long]("longest_seg") == 1)
    assert(r(4L).getAs[Long]("silent_windows") == 5 && r(4L).getAs[Long]("n_segments") == 1)
    // join-free: explode + windows + two doc-local rollups
    val plan = Media.mm12AudioSegments(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "mm12 must be join-free")
  }

  test("mm13 manifest reconciles with its composed stages: mm6 gate, mm4 keeper, shard slice") {
    val sf = TestSpark.sf
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(x => (x.getLong(0), x.getString(1)))
    val keepers = docs.groupBy(d => md5hex(d._2)).values.map(_.map(_._1).min).toSet
    val expect = docs.flatMap { case (id, t) =>
      val bytes = t.getBytes("UTF-8").length.toLong
      val width = 64 + (t.head.toInt % 16) * 32
      val height = 48 + (bytes % 9).toInt * 16
      val frames = bytes / 256 + 1
      if (width >= 128 && height >= 80 && frames >= 2 && keepers(id))
        Some((java.lang.Long.parseLong(md5hex(s"graft:$id").substring(12, 16), 16) % 16,
          frames, bytes))
      else None
    }.groupBy(_._1).map { case (sh, xs) =>
      sh -> ((xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum))
    }
    val r = Media.mm13MediaManifest(spark, sf).collect()
      .map(x => x.getAs[Long]("shard") ->
        ((x.getAs[Long]("n_assets"), x.getAs[Long]("n_frames"), x.getAs[Long]("n_bytes")))).toMap
    assert(r == expect, s"manifest mismatch")
    // the gates must drop something on the live corpus (byte-level
    // payload dups don't exist at this scale — the keeper join's
    // semantics are pinned by the equality above regardless)
    assert(expect.values.map(_._1).sum < docs.length.toLong, "gates dropped nothing")
  }
}

/** JVM-static recorder: task closures are (de)serialized even in local
  * mode, so per-instance buffers would vanish — object fields are the
  * one store every deserialized copy shares in-process. */
object MediaSpec {
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  object Counting extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaStats] = {
      batchSizes.add(batch.size); StubDecoder.decodeBatch(batch)
    }
    def embedBatch(batch: Seq[MediaRow], dim: Int): Seq[MediaEmbedding] = {
      batchSizes.add(batch.size); StubDecoder.embedBatch(batch, dim)
    }
  }
}
