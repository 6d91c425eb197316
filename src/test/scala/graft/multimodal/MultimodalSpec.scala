package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftTestSpark, Tables}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  import spark.implicits._

  test("blob table carries payload bytes + typed metadata") {
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val blobs = Multimodal.toBlobTable(docs, "doc_id", "text")
    assert(blobs.schema.fieldNames.toSeq === Seq("id", "payload", "mime", "n_bytes"))
    val r = blobs.filter(col("id") === 0).first()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8").startsWith("the fast"))
    assert(r.getAs[Long]("n_bytes") === r.getAs[Array[Byte]]("payload").length.toLong)
  }

  test("planted PNGs are real images: deterministic bytes, decodable dims") {
    val a = Multimodal.plantedPng(7L, 20, 12)
    val b = Multimodal.plantedPng(7L, 20, 12)
    assert(a.sameElements(b)) // byte-identical across calls
    // PNG magic
    assert((a(0) & 0xff) === 0x89 && a(1) === 'P'.toByte && a(2) === 'N'.toByte)
    val img = ImageIO.read(new ByteArrayInputStream(a))
    assert(img.getWidth === 20 && img.getHeight === 12)
    // different seed → different image
    assert(!Multimodal.plantedPng(8L, 20, 12).sameElements(a))
  }

  test("image feature extraction decodes real pixels, distributed and deterministic") {
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val feats = Multimodal.featureTable(spark, docs).cache()
    assert(feats.count() === docs.count())
    val a = feats.orderBy("id").limit(5).collect().toSeq
    val b = Multimodal.featureTable(spark, docs.repartition(7)).orderBy("id").limit(5).collect().toSeq
    assert(a.toString === b.toString) // partitioning must not change features
    // spot-check id 0 against a fully driver-side decode with independent
    // pixel math (raster band samples, not getRGB bit twiddling)
    val r = feats.filter(col("id") === 0).first()
    val (w0, h0) = Multimodal.plantedDims(0L)
    assert(r.getAs[Int]("width") === w0 && r.getAs[Int]("height") === h0)
    val payload = Multimodal.plantedPng(17L, w0, h0) // id 0 seed = 0*phi + 17
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    val raster = img.getRaster
    val n = w0 * h0
    def bandMean(band: Int): Double =
      raster.getSamples(0, 0, w0, h0, band, new Array[Double](n)).sum / n
    val expLuma = 0.299 * bandMean(0) + 0.587 * bandMean(1) + 0.114 * bandMean(2)
    assert(math.abs(r.getAs[Double]("mean_luma") - expLuma) < 1e-4)
    assert(r.getAs[Long]("n_bytes") === payload.length.toLong)
    assert(r.getAs[Int]("frames_sampled") === 4)
  }

  test("second codec (JPEG): same pipeline, one-line kernel swap") {
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents").limit(40)
    val jpegBlobs = Multimodal.toImageTable(docs, "doc_id", format = "jpg").cache()
    val r0 = jpegBlobs.filter(col("id") === 0).first()
    val payload = r0.getAs[Array[Byte]]("payload")
    // JPEG magic (SOI marker), correct mime, and NOT the PNG bytes
    assert((payload(0) & 0xff) === 0xff && (payload(1) & 0xff) === 0xd8)
    assert(r0.getAs[String]("mime") === "image/jpeg")
    // The SAME feature stage decodes the JPEG payloads untouched:
    val feats = Multimodal.extractImageFeatures(jpegBlobs).toDF().cache()
    assert(feats.count() === 40)
    val pngFeats = Multimodal.featureTable(spark, docs)
      .select("id", "width", "height", "mean_luma")
      .withColumnRenamed("mean_luma", "png_luma")
    val joined = feats.join(pngFeats, Seq("id", "width", "height")).cache()
    // lossless dimensions: every id joins on (id, width, height)
    assert(joined.count() === 40)
    // lossy pixels: mean luma within JPEG-quantization distance of the
    // lossless decode (planted gradients compress well; 6/255 is generous)
    val maxDrift = joined
      .agg(max(abs(col("mean_luma") - col("png_luma")))).first().getDouble(0)
    assert(maxDrift < 6.0, s"JPEG luma drifted $maxDrift from lossless decode")
  }

  test("decode rejects non-image payloads loudly") {
    intercept[Exception] {
      Multimodal.decodeImage("not a png".getBytes("UTF-8"))
    }
  }

  test("frame sampling offsets are even and bounded") {
    assert(Multimodal.sampleOffsets(100, 4) === Seq(0, 25, 50, 75))
    assert(Multimodal.sampleOffsets(3, 4).forall(_ < 3))
    assert(Multimodal.sampleOffsets(0, 4) === Seq.empty)
  }

  test("aHash64 is deterministic and all-integer: same image same hash, dims drive structure") {
    def hashOf(seed: Long, w: Int, h: Int): Long =
      Multimodal.aHash64(ImageIO.read(new ByteArrayInputStream(Multimodal.plantedPng(seed, w, h))))
    assert(hashOf(7L, 20, 12) === hashOf(7L, 20, 12))
    // same dims, different noise seed → small Hamming (gradient dominates)
    val d = java.lang.Long.bitCount(hashOf(7L, 20, 12) ^ hashOf(99L, 20, 12))
    assert(d <= 16, s"same-gradient images should be close, got hamming $d")
  }

  test("m_phash_pairs: banded image near-dup equals a driver-side brute force of the same rule") {
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents")
    val got = Multimodal.imageNearDupPairs(Multimodal.toImageTable(docs, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // Brute force, driver-side: decode every planted image, hash, then apply
    // the documented rule directly — pair (a, b) iff Hamming ≤ 2 AND the two
    // hashes share at least one 16-bit chunk whose bucket is ≤ maxBucket.
    val ids = docs.select(col("doc_id").cast("long")).as[Long].collect()
    val hs = ids.map { id =>
      val (w, h) = Multimodal.plantedDims(id)
      val png = Multimodal.plantedPng(id * 0x9e3779b97f4a7c15L + 17, w, h)
      id -> Multimodal.aHash64(ImageIO.read(new ByteArrayInputStream(png)))
    }.toMap
    def chunk(sig: Long, b: Int): Long = (sig >>> (b * 16)) & 0xFFFFL
    val bucket = scala.collection.mutable.Map.empty[(Int, Long), Int].withDefaultValue(0)
    for (id <- ids; b <- 0 until 4) bucket((b, chunk(hs(id), b))) += 1
    val sortedIds = ids.sorted
    val exp = (for {
      i <- sortedIds.indices.iterator
      j <- (i + 1 until sortedIds.length).iterator
      a = sortedIds(i); b2 = sortedIds(j)
      d = java.lang.Long.bitCount(hs(a) ^ hs(b2))
      if d <= 2 && (0 until 4).exists(bb =>
        chunk(hs(a), bb) == chunk(hs(b2), bb) && bucket((bb, chunk(hs(a), bb))) <= 64)
    } yield (a, b2, d.toLong)).toSet
    assert(exp.nonEmpty, "planted corpus must yield near-dup image pairs")
    assert(got === exp)
  }

  test("pattern images: decoded aHash equals the closed-form planted phash") {
    // The bridge the m_phash_pairs_portable full oracle stands on: render →
    // BMP encode → decode → aHash64 must reproduce plantedPhash exactly for
    // every perturbation class. Checked through the DISTRIBUTED path
    // (toPatternImageTable + imageHashes), not just the kernels.
    import spark.implicits._
    val ids = (0L until 96L) // covers all 16 groups × all 3 classes
    val docs = ids.toDF("doc_id")
    val got = Multimodal.imageHashes(Multimodal.toPatternImageTable(docs, "doc_id"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      assert(got(id) === Multimodal.plantedPhash(id),
        s"id=$id: decoded hash != closed form")
    }
    // and the bright-count invariant that makes the equality hold
    ids.foreach { id =>
      val nb = java.lang.Long.bitCount(Multimodal.plantedPhash(id))
      assert(nb >= 1 && nb <= 63, s"id=$id bright count $nb out of [1,63]")
    }
    // the JPEG path would NOT be hash-stable (lossy) — the portable oracle
    // must stay on a lossless codec; BMP and PNG agree
    val viaPng = Multimodal.imageHashes(
      Multimodal.toPatternImageTable(docs, "doc_id", format = "png"))
      .as[(Long, Long)].collect().toMap
    assert(viaPng === got)
  }

  test("PCM16LE codec: exact round-trip, little-endian layout, sign extension") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 255, -256)
    val bytes = Multimodal.encodePcm16le(samples)
    assert(bytes.length == samples.length * 2)
    // Little-endian: low byte first (sample 1 = 0x0001 -> bytes 01 00).
    assert(bytes(2) == 0x01.toByte && bytes(3) == 0x00.toByte)
    // Sign extension: -1 = 0xFFFF.
    assert(bytes(4) == 0xff.toByte && bytes(5) == 0xff.toByte)
    assert(Multimodal.decodePcm16le(bytes).toSeq == samples.toSeq)
  }

  test("audio framing emits the trailing partial frame (no silent sample loss)") {
    // doc 7 plants 384 samples; frameLen 100 -> frames of 100,100,100,84.
    val blobs = Multimodal.toAudioTable(Seq(7L).toDF("doc_id"), "doc_id")
    val frames = Multimodal.audioFrameFeatures(blobs, frameLen = 100)
      .collect().sortBy(_.frame_idx)
    assert(Multimodal.plantedSampleCount(7L) == 384)
    assert(frames.map(_.n_samples).toSeq == Seq(100L, 100L, 100L, 84L))
    assert(frames.map(_.n_samples).sum == 384L)
  }

  test("audio frame features: distributed kernel equals driver-side waveform math") {
    val docs = Tables.load(spark, GraftTestSpark.sfDir, "documents").limit(40)
    val got = Multimodal.audioFrameFeatures(Multimodal.toAudioTable(docs, "doc_id"))
      .collect().map(f => (f.doc_id, f.frame_idx) -> f).toMap
    val ids = docs.select(col("doc_id")).as[Long].collect()
    assert(got.nonEmpty)
    ids.foreach { id =>
      val n = Multimodal.plantedSampleCount(id)
      val s = Array.tabulate(n)(i => Multimodal.plantedSample(id, i))
      (0 until n / 64).foreach { f =>
        val fr = s.slice(f * 64, f * 64 + 64)
        val exp = (
          fr.map(v => math.abs(v.toLong)).max,
          fr.map(v => v.toLong * v).sum,
          fr.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0)).toLong)
        val g = got((id, f.toLong))
        assert((g.peak, g.sum_sq, g.zero_crossings) == exp, s"doc $id frame $f")
        assert(g.n_samples == 64L)
      }
    }
    // Frame counts: exactly n/64 frames per doc, nothing extra.
    assert(got.size == ids.map(id => Multimodal.plantedSampleCount(id) / 64).sum)
  }
}
