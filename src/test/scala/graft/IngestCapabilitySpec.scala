package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.ingest.{Embedder, HashingEmbedder, Multimodal}
import graft.sources.ObjectSources
import graft.index.{Catalog, CollectionMeta, IvfIndex}

/** Capability tests (SURVEY A3–A5, A16/A17, B5, C1 binary/text sources):
  * pieces verified by unit/e2e tests rather than the DuckDB oracle. */
class IngestCapabilitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ingest-capability-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resources = "src/test/resources/objects"

  override def afterAll(): Unit = spark.stop()

  // ---- Embedder (A4/A5) ----

  test("HashingEmbedder: dims, unit norm, determinism, float32") {
    for ((e, dim) <- Seq((Embedder.text, 384), (Embedder.image, 512))) {
      val v = e.embedText("the quick brown fox")
      assert(v.length == dim)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm")
      assert(v.toSeq == e.embedText("the quick brown fox").toSeq, "deterministic")
    }
    val b = Embedder.image.embedBytes(Array.tabulate[Byte](64)(_.toByte))
    assert(b.length == 512)
    assert(Embedder.text.embedText("") forall (_ == 0.0f), "empty text → zero vector")
  }

  test("similar texts embed closer than dissimilar ones") {
    val e = HashingEmbedder(384)
    // dot product ≡ cosine here ONLY because HashingEmbedder emits
    // unit-norm vectors (asserted in its own test) — named honestly so a
    // non-normalized embedder change doesn't silently turn this into a
    // magnitude comparison
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = e.embedText("spark vector search engine over parquet files")
    val near = e.embedText("spark vector search engine over parquet data")
    val far = e.embedText("completely unrelated words about gardening tools")
    assert(math.abs(dot(base, base) - 1.0) < 1e-6,
      "unit-norm precondition for dot ≡ cosine")
    assert(dot(base, near) > dot(base, far))
  }

  // ---- Object sources (A3, C1) ----

  test("text wholetext source: one row per object, UTF-8 decode") {
    val df = ObjectSources.textObjects(spark, s"$resources/text/*.txt")
    val rows = df.collect()
    // NB: Spark's file sources (text AND binaryFile) emit NO row for a
    // 0-byte file — empty objects vanish from a scan. The reference would
    // have embedded the empty string instead; an ingest pipeline that must
    // index empty objects has to handle them at the event layer (the
    // notification carries size=0), not via a storage scan.
    assert(rows.length == 3)
    val byPath = rows.map(r => (r.getAs[String]("path").split('/').last, r.getAs[String]("text"))).toMap
    assert(!byPath.contains("empty.txt"))
    assert(byPath("doc1.txt").contains("quick brown fox"))
    assert(byPath("doc1.txt").contains("\n"), "wholetext keeps newlines")
    assert(byPath("nonascii.txt").contains("café") && byPath("nonascii.txt").contains("日本語"))
    val bin = ObjectSources.binaryObjects(spark, s"$resources/text/empty.txt").collect()
    assert(bin.isEmpty, "binaryFile drops empty objects too")
  }

  test("binaryFile source: content + length metadata") {
    val df = ObjectSources.binaryObjects(spark, s"$resources/bin/*")
    val rows = df.collect()
    assert(rows.length == 3)
    val img = rows.find(_.getAs[String]("path").endsWith("img1.png")).get
    // img1.png is a REAL 24×16 PNG (1236 bytes) so the imageio decode arm
    // operates on true pixels
    assert(img.getAs[Long]("length") == 1236L)
    assert(img.getAs[Array[Byte]]("content").length == 1236)
  }

  test("end-to-end: text objects → embed → search finds the right doc") {
    import org.apache.spark.sql.functions._
    val docs = ObjectSources.textObjects(spark, s"$resources/text/doc*.txt")
    val embedded = Embedder.embedDocuments(docs, "text")
    val q = Embedder.text.embedText("quick brown fox jumps")
    val top = embedded
      .select(col("path"), graft.functions.VectorFunctions
        .dot_product(col("vec"), typedLit(q)).as("sim"))
      .orderBy(desc("sim")).limit(1).collect()
    assert(top.head.getAs[String]("path").endsWith("doc1.txt"))
  }

  // ---- Multimodal (mandate) ----

  test("multimodal pipeline: binary scan → typed dataset → features") {
    import spark.implicits._
    val media = Multimodal.fromBinaryFiles(spark, s"$resources/bin/*")
    val types = media.collect().map(m => (m.key.split('/').last, m.mediaType)).toMap
    assert(types("img1.png") == "image" && types("clip1.wav") == "audio"
      && types("vid1.mp4") == "video")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.features.length == Embedder.ImageDim))
    assert(feats.forall(f => f.width >= 1 && f.height >= 1 && f.nFrames >= 1))
    // the image arm is a REAL decode: javax.imageio parses the PNG and the
    // features see its true dimensions and pixels
    val img = feats.find(_.key.endsWith("img1.png")).get
    assert(img.decoded, "a valid PNG must decode for real, not via the stub")
    assert(img.width == 24 && img.height == 16,
      s"img1.png is 24×16; decode reported ${img.width}×${img.height}")
    // the audio arm is a REAL decode too (r10): javax.sound.sampled
    // parses the WAV and the features see the true PCM geometry —
    // width carries the sample rate, height the channels, nFrames the
    // sample count (MediaFeatures' documented modality mapping)
    val wav = feats.find(_.key.endsWith("clip1.wav")).get
    assert(wav.decoded, "a valid PCM WAV must decode for real, not via the stub")
    assert(wav.width == 8000 && wav.height == 1 && wav.nFrames == 400,
      s"clip1.wav is 8 kHz mono × 400 samples; got ${wav.width}/${wav.height}/${wav.nFrames}")
    // video stays on the loudly-marked stub (no mp4 codec in this image)
    val vid = feats.find(_.key.endsWith("vid1.mp4")).get
    assert(!vid.decoded)
    assert(vid.nFrames == 1 + 3000 / 1024)
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media).collect()
      .find(_.key.endsWith("vid1.mp4")).get
    assert(vid.features.toSeq == again.features.toSeq)

    // image features ride the DECODED PIXELS, not the container bytes:
    // the same image re-encoded as BMP must embed identically to the PNG
    val pngBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$resources/bin/img1.png"))
    val bmp = {
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pngBytes))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "bmp", out)
      out.toByteArray
    }
    // a VALID png header claiming 100000×100000 (correct CRC): the
    // dimension cap must reject it from the header alone — decoding it
    // would allocate a ~30 GB buffer on an executor
    val bomb = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
      val body = new java.io.ByteArrayOutputStream()
      body.write("IHDR".getBytes("US-ASCII"))
      body.write(java.nio.ByteBuffer.allocate(13)
        .putInt(100000).putInt(100000)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
      val crc = new java.util.zip.CRC32(); crc.update(body.toByteArray)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
      out.write(body.toByteArray)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      out.toByteArray
    }
    val twoEncodings = Multimodal.extractFeatures(Seq(
      Multimodal.MediaObject("a.png", "image", pngBytes),
      Multimodal.MediaObject("a.bmp", "image", bmp),
      // corrupt payload: must fall back to the stub, flagged undecoded
      Multimodal.MediaObject("bad.png", "image", Array.fill(64)('A'.toByte)),
      Multimodal.MediaObject("bomb.png", "image", bomb)
    ).toDS()).collect().map(f => f.key -> f).toMap
    assert(twoEncodings("a.png").features.toSeq == twoEncodings("a.bmp").features.toSeq,
      "two containers of the same pixels must produce identical features")
    assert(twoEncodings("a.png").decoded && twoEncodings("a.bmp").decoded)
    assert(!twoEncodings("bad.png").decoded,
      "a corrupt image must be flagged, never fabricated as decoded")
    assert(!twoEncodings("bomb.png").decoded,
      "a decompression-bomb header must be rejected from the header alone")
    val sampled = Multimodal.sampleFrameIndexes(
      Multimodal.extractFeatures(media).toDF(), stride = 2)
      .where($"key".endsWith("vid1.mp4"))
      .select($"sampled_frames").head().getSeq[Int](0)
    assert(sampled == Seq(0, 2))
    // resize: aspect ratio preserved, never upscales, bounded by the box
    // (audio rows pass through — their width/height carry sample rate
    // and channels, not pixels)
    val resized = Multimodal.resize(Multimodal.extractFeatures(media), 8, 8).collect()
    assert(resized.filter(_.mediaType != "audio")
      .forall(f => f.width <= 8 && f.height <= 8))
    assert(resized.find(_.mediaType == "audio").get.width == 8000,
      "resize must not touch audio geometry")
    val orig = feats.map(f => f.key -> (f.width, f.height)).toMap
    resized.filter(_.mediaType != "audio").foreach { f =>
      val (w0, h0) = orig(f.key)
      val ratio0 = w0.toDouble / h0
      val ratio1 = f.width.toDouble / f.height
      assert(math.abs(ratio0 - ratio1) / ratio0 < 0.35, s"aspect drift for ${f.key}")
    }

    // REAL pixel resample: extractFeatures(resizeTo) scales the decoded
    // pixels (Graphics2D bilinear), not just the dims. A solid-color
    // 64×48 downscaled into a 32×32 box must land at 32×24 and embed
    // IDENTICALLY to a natively 32×24 image of the same color — bilinear
    // interpolation of a constant field is that constant, so any
    // divergence means the resample fabricated pixels.
    def solidPng(w: Int, h: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => bi.setRGB(x, y, 0xc04020)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", out)
      out.toByteArray
    }
    val resampled = Multimodal.extractFeatures(Seq(
      Multimodal.MediaObject("big.png", "image", solidPng(64, 48)),
      Multimodal.MediaObject("native.png", "image", solidPng(32, 24)),
      Multimodal.MediaObject("small.png", "image", solidPng(10, 10))
    ).toDS(), resizeTo = Some((32, 32))).collect().map(f => f.key -> f).toMap
    val big = resampled("big.png")
    assert(big.decoded && big.width == 32 && big.height == 24,
      s"64×48 into a 32×32 box must letterbox to 32×24, got ${big.width}×${big.height}")
    assert(big.features.toSeq == resampled("native.png").features.toSeq,
      "downscaled solid image must embed identically to the natively-sized one")
    assert(resampled("small.png").width == 10 && resampled("small.png").height == 10,
      "resample never upscales")
  }

  test("animated GIF: real composited frames, temporal mean-pool, pixel-not-byte features") {
    import spark.implicits._
    def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => bi.setRGB(x, y, rgb)))
      bi
    }
    def animatedGif(frames: Seq[java.awt.image.BufferedImage],
                    delayTime: String = "10"): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { f =>
          val md = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(f), writer.getDefaultWriteParam)
          val fmt = "javax_imageio_gif_image_1.0"
          val root = md.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          gce.setAttribute("disposalMethod", "doNotDispose")
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "FALSE")
          gce.setAttribute("delayTime", delayTime)
          gce.setAttribute("transparentColorIndex", "0")
          root.appendChild(gce)
          md.setFromTree(fmt, root)
          writer.writeToSequence(new javax.imageio.IIOImage(f, null, md), null)
        }
        writer.endWriteSequence()
      } finally { ios.close(); writer.dispose() }
      out.toByteArray
    }

    // compositing: a half-size delta frame accumulates onto the canvas
    // (doNotDispose), so sampled frame 1 is green top-left over red —
    // embedding the raw raster instead would see a 16×8 green image
    val composite = animatedGif(Seq(frame(32, 16, 0xff0000), frame(16, 8, 0x00ff00)))
    val Some((cw, ch, n, sampled)) = Multimodal.decodeGifFrames(composite)
    assert((cw, ch, n) == (32, 16, 2), s"canvas/frames: $cw×$ch×$n")
    assert(sampled.size == 2)
    def px(buf: Array[Byte], x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * cw + x) * 3
      ((buf(i) & 0xff), (buf(i + 1) & 0xff), (buf(i + 2) & 0xff))
    }
    assert(px(sampled(1), 0, 0) == (0, 255, 0), "delta frame drew at its offset")
    assert(px(sampled(1), 31, 15) == (255, 0, 0),
      "pixels outside the delta frame keep the accumulated canvas")

    // stride sampling: 4 frames at stride 2 → frames 0 and 2 sampled,
    // nFrames still reports everything composited
    val four = animatedGif(Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
      .map(frame(8, 8, _)))
    val Some((_, _, n4, s4)) = Multimodal.decodeGifFrames(four, stride = 2)
    assert(n4 == 4 && s4.size == 2)

    // extractFeatures: animated → decoded=true, real frame count, and the
    // features ride PIXELS — re-encoding with different frame delays
    // (different bytes, same frames) embeds identically, while changing
    // one frame's pixels does not. Patterned (not solid) frames: a solid
    // frame is a 3-byte-cyclic buffer whose 4-byte feature quads are
    // phase-shifts of each other, so two solid COLORS legitimately hash
    // to the same quad multiset — patterns carry positional structure.
    def patterned(seed: Int): java.awt.image.BufferedImage = {
      val bi = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach(x =>
        bi.setRGB(x, y, (seed * 7777 + x * 31 + y * 131) & 0xffffff)))
      bi
    }
    val redBlue = animatedGif(Seq(patterned(1), patterned(2)))
    val redBlueSlow = animatedGif(Seq(patterned(1), patterned(2)), delayTime = "200")
    val redGreen = animatedGif(Seq(patterned(1), patterned(3)))
    assert(!redBlue.sameElements(redBlueSlow), "the delay change must alter the bytes")
    val feats = Multimodal.extractFeatures(Seq(
      Multimodal.MediaObject("rb.gif", "image", redBlue),
      Multimodal.MediaObject("rbslow.gif", "image", redBlueSlow),
      Multimodal.MediaObject("rg.gif", "image", redGreen)
    ).toDS(), frameStride = 1).collect().map(f => f.key -> f).toMap
    assert(feats("rb.gif").decoded && feats("rb.gif").nFrames == 2)
    assert(feats("rb.gif").features.toSeq == feats("rbslow.gif").features.toSeq,
      "same frames, different container bytes → identical features")
    assert(feats("rb.gif").features.toSeq != feats("rg.gif").features.toSeq,
      "a changed frame must change the features")
    // temporal pooling stays unit-norm
    val norm = math.sqrt(feats("rb.gif").features.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5, s"pooled features must be unit-norm (got $norm)")

    // a single-frame GIF is the n=1 case of the multi-frame path (one
    // decode, no pooling arithmetic) and must still embed bit-identically
    // to the equivalent PNG — the decoded-pixels contract across containers
    val oneGif = animatedGif(Seq(frame(16, 16, 0xc04020)))
    val onePng = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frame(16, 16, 0xc04020), "png", out)
      out.toByteArray
    }
    val still = Multimodal.extractFeatures(Seq(
      Multimodal.MediaObject("one.gif", "image", oneGif),
      Multimodal.MediaObject("one.png", "image", onePng)
    ).toDS()).collect().map(f => f.key -> f).toMap
    assert(still("one.gif").nFrames == 1 && still("one.gif").decoded)
    assert(still("one.gif").features.toSeq == still("one.png").features.toSeq,
      "single-frame GIF must embed like any other still container")
  }

  test("audio decode: container-invariant features, channel mix, corrupt fallback") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // same 16-bit PCM rendered into different containers/endiannesses
    def enc(samples: Array[Short], big: Boolean): Array[Byte] = {
      val b = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val lo = (samples(i) & 0xff).toByte
        val hi = ((samples(i) >> 8) & 0xff).toByte
        if (big) { b(2 * i) = hi; b(2 * i + 1) = lo }
        else { b(2 * i) = lo; b(2 * i + 1) = hi }
        i += 1
      }
      b
    }
    def fileBytes(samples: Array[Short], channels: Int,
        tpe: AudioFileFormat.Type, big: Boolean): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, channels, true, big)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(enc(samples, big)), fmt,
        samples.length / channels)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, out)
      out.toByteArray
    }
    val sig = Array.tabulate(200)(i => (8000 * math.sin(i * 0.2)).toShort)
    val feats = Multimodal.extractFeatures(Seq(
      Multimodal.MediaObject("a.wav", "audio",
        fileBytes(sig, 1, AudioFileFormat.Type.WAVE, big = false)),
      // the identical PCM in a big-endian AU container
      Multimodal.MediaObject("a.au", "audio",
        fileBytes(sig, 1, AudioFileFormat.Type.AU, big = true)),
      // stereo with L = R = the mono signal: the mono mix is exact
      Multimodal.MediaObject("st.wav", "audio",
        fileBytes(sig.flatMap(s => Array(s, s)), 2,
          AudioFileFormat.Type.WAVE, big = false)),
      // compressed/garbage audio cannot parse → loud stub, quarantined
      Multimodal.MediaObject("bad.mp3", "audio", Array.fill(100)(7.toByte))
    ).toDS()).collect().map(f => f.key -> f).toMap
    val wav = feats("a.wav")
    assert(wav.decoded && wav.width == 8000 && wav.height == 1 && wav.nFrames == 200)
    assert(wav.features.toSeq == feats("a.au").features.toSeq,
      "two containers of the same PCM must produce identical features")
    val st = feats("st.wav")
    assert(st.decoded && st.height == 2 && st.nFrames == 200)
    assert(st.features.toSeq == wav.features.toSeq,
      "stereo with identical channels must mono-mix to the same features")
    assert(!feats("bad.mp3").decoded,
      "undecodable audio must be flagged, never fabricated as decoded")
  }

  test("video container metadata: real tkhd geometry + stts frame count; crafted sizes stay safe") {
    import spark.implicits._
    // a minimal valid ISO-BMFF tree: ftyp + moov(trak(tkhd,
    // mdia(minf(stbl(stts))))) — 640×360, 300 samples
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(tpe.getBytes("ISO-8859-1"))
      b.put(payload)
      b.array()
    }
    val tkhd = {
      val p = java.nio.ByteBuffer.allocate(84) // v0 payload
      p.position(76)
      p.putInt(640 << 16).putInt(360 << 16) // 16.16 fixed dims
      box("tkhd", p.array())
    }
    val stts = {
      val p = java.nio.ByteBuffer.allocate(16)
      p.putInt(0).putInt(1).putInt(300).putInt(1) // 1 entry: 300 samples
      box("stts", p.array())
    }
    val mp4 = box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++
      box("moov", tkhd ++ box("mdia", box("minf", box("stbl", stts))))
    val feats = Multimodal.extractFeatures(Seq(
      Multimodal.MediaObject("real.mp4", "video", mp4),
      // a crafted box size pointing past the buffer: the walk must stop
      // cleanly and fall back to the stub, never read out of bounds
      Multimodal.MediaObject("crafted.mp4", "video",
        mp4.take(20) ++ java.nio.ByteBuffer.allocate(8)
          .putInt(Int.MaxValue).put("moov".getBytes("ISO-8859-1")).array()),
      Multimodal.MediaObject("junk.mp4", "video", Array.fill(64)(9.toByte))
    ).toDS()).collect().map(f => f.key -> f).toMap
    val real = feats("real.mp4")
    assert(real.width == 640 && real.height == 360 && real.nFrames == 300,
      s"container metadata must be real: ${real.width}×${real.height}/${real.nFrames}")
    // pixel decode is still the documented boundary: features hash the
    // container, so decoded stays false and quarantines still catch it
    assert(!real.decoded)
    assert(!feats("crafted.mp4").decoded && !feats("junk.mp4").decoded)
    // resizeTo applies the metadata letterbox arithmetic to real dims
    val boxed = Multimodal.extractFeatures(Seq(
      Multimodal.MediaObject("real.mp4", "video", mp4)).toDS(),
      resizeTo = Some((320, 320))).collect().head
    assert(boxed.width == 320 && boxed.height == 180)
  }

  // ---- Catalog (A16/A17) ----

  test("catalog: idempotent create, describe, list, drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog").toString
    val cat = new Catalog(dir)
    val meta = CollectionMeta("bkt_text_0001", 384, "l2", "IVF_FLAT", 16384, "/data/bkt_text_0001")
    assert(cat.createCollection(meta), "first create wins")
    assert(!cat.createCollection(meta.copy(dim = 999)), "second create is a no-op")
    assert(cat.describeCollection("bkt_text_0001").get.dim == 384, "no-op kept original")
    assert(cat.hasCollection("bkt_text_0001"))
    cat.createCollection(CollectionMeta("bkt_img", 512, "l2", "FLAT", 1, "/data/bkt_img"))
    assert(cat.listCollections() == Seq("bkt_img", "bkt_text_0001"))
    assert(cat.dropCollection("bkt_img"))
    assert(cat.listCollections() == Seq("bkt_text_0001"))
    intercept[IllegalArgumentException] { cat.describeCollection("../evil") }
  }

  test("catalog: racing creates elect exactly one winner, metadata intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog3").toString
    val cat = new Catalog(dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val attempts = (0 until 16).map { i =>
      Future {
        gate.await()
        val won = cat.createCollection(
          CollectionMeta("raced", dim = i, "l2", "FLAT", 0, s"/data/raced-$i"))
        (i, won)
      }
    }
    gate.countDown()
    val outcomes = Await.result(Future.sequence(attempts), 60.seconds)
    val winners = outcomes.filter(_._2)
    assert(winners.size == 1, s"exactly one create must win, got $winners")
    val stored = cat.describeCollection("raced").get
    assert(stored.dim == winners.head._1,
      "the stored metadata must be the winner's, not a loser's overwrite")
  }

  test("catalog round-trips dataPaths containing JSON-hostile characters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-catalog2").toString
    val cat = new Catalog(dir)
    val nasty = """/tmp/run,2026/{weird}/pa"th\seg"""
    cat.createCollection(CollectionMeta("nasty", 64, "l2", "FLAT", 1, nasty))
    assert(cat.describeCollection("nasty").get.dataPath == nasty)
  }

  // ---- IVF (B5) ----

  test("IVF: nprobe=nlist equals exact scan; partial probe keeps decent recall") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val (indexed, quantizer) = IvfIndex.build(emb, "embedding", nlist = 16)
    indexed.cache().count()
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray

    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getAs[Long]("vec_id")).toSeq

    val exact = ids(emb
      .select(col("vec_id"), graft.functions.VectorFunctions
        .l2_distance(col("embedding"), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10))

    val full = ids(IvfIndex.searchL2(indexed, quantizer, "embedding", "vec_id", q, 10, nprobe = 16))
    assert(full == exact, "nprobe = nlist must reproduce the exact scan")

    val pruned = ids(IvfIndex.searchL2(indexed, quantizer, "embedding", "vec_id", q, 10, nprobe = 4))
    val recall = pruned.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 with nprobe=4/16 was $recall")
    assert(pruned.contains(7L), "the query's own row lives in the probed cell")
    indexed.unpersist()
  }

  test("IVF at rest: probe filter becomes a parquet partition prune") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val (indexed, quantizer) = IvfIndex.build(emb, "embedding", nlist = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.writeIndexed(indexed, path)
    val loaded = IvfIndex.loadIndexed(spark, path)
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray
    val res = IvfIndex.searchL2(loaded, quantizer, "embedding", "vec_id", q, 5, nprobe = 2)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroidId"),
      s"expected partition pruning on centroidId, got:\n$plan")
    assert(res.collect().map(_.getAs[Long]("vec_id")).contains(7L))
  }

  // ---- RGW connectivity (A3's deployed form; conf-layer only, no net) ----

  test("RgwConfig wires the reference's env contract into S3A conf") {
    import graft.sources.RgwConfig
    // the env the reference's pod spec injects (pythonvectordbceph.py:49-60)
    val cfg = RgwConfig.fromEnv(Map(
      "BUCKET_HOST" -> "rook-ceph-rgw-my-store.rook-ceph.svc",
      "BUCKET_PORT" -> "8080",
      "AWS_ACCESS_KEY_ID" -> "AK", "AWS_SECRET_ACCESS_KEY" -> "SK")).get
    assert(cfg == RgwConfig("http://rook-ceph-rgw-my-store.rook-ceph.svc:8080", "AK", "SK"))
    assert(RgwConfig.fromEnv(Map("BUCKET_HOST" -> "h")).isEmpty, "no creds → no config")

    cfg.apply(spark)
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://rook-ceph-rgw-my-store.rook-ceph.svc:8080")
    assert(hc.get("fs.s3a.access.key") == "AK")
    assert(hc.get("fs.s3a.path.style.access") == "true", "RGW buckets are not DNS subdomains")
    assert(hc.get("fs.s3a.connection.ssl.enabled") == "false", "http endpoint → plain TCP")

    // per-bucket override: a second gateway/credential set coexists (the
    // reference's s3 vs s3vectors clients)
    RgwConfig("https://other-gw:443", "AK2", "SK2").applyForBucket(spark, "vectors")
    assert(hc.get("fs.s3a.bucket.vectors.endpoint") == "https://other-gw:443")
    assert(hc.get("fs.s3a.bucket.vectors.connection.ssl.enabled") == "true")
    assert(hc.get("fs.s3a.endpoint") == "http://rook-ceph-rgw-my-store.rook-ceph.svc:8080",
      "a per-bucket override must not clobber the global gateway")
  }

  /** In-process S3-protocol object server: path-style HEAD / ranged GET /
    * PUT / DELETE / CopyObject (`x-amz-copy-source`) / ListObjectsV2 with
    * delimiter grouping and 2-entry pages (so the filesystem's
    * continuation-token loop actually runs). Records every Authorization
    * header and request path for the contract assertions. */
  private final class S3Stub(bucket: String, objects: Map[String, Array[Byte]]) {
    val store = new scala.collection.concurrent.TrieMap[String, Array[Byte]]()
    store ++= objects
    val auths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var listPages = 0
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def port: Int = server.getAddress.getPort

    private def xmlEsc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    // chaos injection: when on, the FIRST attempt of every distinct
    // (method, path, query) is answered 503 SlowDown BEFORE normal
    // handling — S3's load-shedding behavior. Deterministic under ANY
    // task interleaving (unlike an every-Nth counter, where concurrent
    // tasks could in principle land a whole retry budget on shed
    // indices): every operation fails exactly once, so the client's
    // retry is exercised on EVERY path and success is guaranteed iff
    // retry works.
    @volatile var shedFirstAttempts = false
    val shedSeen = new scala.collection.concurrent.TrieMap[String, Boolean]()
    @volatile var shedCount = 0L

    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      auths.add(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
      val rawPath = ex.getRequestURI.getPath
      paths.add(rawPath)
      def send(code: Int, body: Array[Byte]): Unit = {
        // HEAD must never pass a body length through sendResponseHeaders:
        // the JDK httpserver logs a WARN per call (the r17 driver test run
        // drowned in hundreds of them via the 503-shed and list paths).
        // Advertise the length as a header and send no body, like S3 does.
        if (ex.getRequestMethod == "HEAD") {
          if (body.nonEmpty)
            ex.getResponseHeaders.add("Content-Length", body.length.toString)
          ex.sendResponseHeaders(code, -1)
          ex.close()
        } else {
          ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
          if (body.nonEmpty) ex.getResponseBody.write(body)
          ex.close()
        }
      }
      val reqKey = ex.getRequestMethod + " " + rawPath + "?" +
        Option(ex.getRequestURI.getRawQuery).getOrElse("") + "|" +
        Option(ex.getRequestHeaders.getFirst("Range")).getOrElse("")
      if (shedFirstAttempts && shedSeen.putIfAbsent(reqKey, true).isEmpty) {
        shedCount += 1
        send(503, "<Error><Code>SlowDown</Code></Error>".getBytes("UTF-8"))
      }
      else if (rawPath != s"/$bucket" && !rawPath.startsWith(s"/$bucket/")) send(404, Array.empty)
      else if (rawPath == s"/$bucket" || rawPath == s"/$bucket/") {
        // ListObjectsV2
        listPages += 1
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        val prefix = q.getOrElse("prefix", "")
        val delim = q.get("delimiter")
        val token = q.get("continuation-token")
        val matching = store.keys.filter(_.startsWith(prefix)).toSeq
        // delimiter grouping: direct children are Contents, deeper keys
        // collapse into CommonPrefixes
        val (filesAll, prefixesAll) = delim match {
          case Some(d) =>
            val rest = matching.map(k => k -> k.stripPrefix(prefix))
            (rest.filterNot(_._2.contains(d)).map(_._1).sorted,
              rest.filter(_._2.contains(d))
                .map { case (_, r) => prefix + r.takeWhile(_.toString != d) + d }
                .distinct.sorted)
          case None => (matching.sorted, Seq.empty)
        }
        val entries: Seq[Either[String, String]] = // Left=file key, Right=prefix
          (filesAll.map(Left(_)) ++ prefixesAll.map(Right(_)))
            .sortBy(_.fold(identity, identity))
        val after = token.fold(entries)(t => entries.dropWhile(_.fold(identity, identity) <= t))
        val page = after.take(2)
        val truncated = after.size > 2
        val body = new StringBuilder(
          s"""<?xml version="1.0" encoding="UTF-8"?><ListBucketResult>""" +
            s"<Name>$bucket</Name><Prefix>${xmlEsc(prefix)}</Prefix>" +
            s"<IsTruncated>$truncated</IsTruncated><KeyCount>${page.size}</KeyCount>")
        page.foreach {
          case Left(k) => body.append(
            s"<Contents><Key>${xmlEsc(k)}</Key><Size>${store(k).length}</Size>" +
              "<LastModified>2026-01-01T00:00:00.000Z</LastModified>" +
              "<ETag>\"0\"</ETag></Contents>")
          case Right(p) => body.append(
            s"<CommonPrefixes><Prefix>${xmlEsc(p)}</Prefix></CommonPrefixes>")
        }
        if (truncated) body.append(
          s"<NextContinuationToken>${xmlEsc(page.last.fold(identity, identity))}" +
            "</NextContinuationToken>")
        body.append("</ListBucketResult>")
        ex.getResponseHeaders.add("Content-Type", "application/xml")
        send(200, body.toString.getBytes("UTF-8"))
      } else {
        val key = java.net.URLDecoder.decode(rawPath.stripPrefix(s"/$bucket/"), "UTF-8")
        ex.getRequestMethod match {
          case "PUT" =>
            Option(ex.getRequestHeaders.getFirst("x-amz-copy-source")) match {
              case Some(src) =>
                // CopyObject: bytes never cross the wire
                val srcKey = java.net.URLDecoder.decode(
                  src.stripPrefix(s"/$bucket/"), "UTF-8")
                store.get(srcKey) match {
                  case None => send(404, Array.empty)
                  case Some(data) =>
                    store.put(key, data)
                    send(200, ("<CopyObjectResult><ETag>\"0\"</ETag>" +
                      "</CopyObjectResult>").getBytes("UTF-8"))
                }
              case None =>
                store.put(key, ex.getRequestBody.readAllBytes())
                send(200, Array.empty)
            }
          case "DELETE" =>
            store.remove(key)
            send(204, Array.empty)
          case method => store.get(key) match {
            case None => send(404, Array.empty)
            case Some(data) => method match {
              case "HEAD" =>
                ex.getResponseHeaders.add("Content-Length", data.length.toString)
                ex.sendResponseHeaders(200, -1)
                ex.close()
              case "GET" =>
                Option(ex.getRequestHeaders.getFirst("Range")) match {
                  case Some(r) =>
                    // prefix (bytes=N-[M]) and suffix (bytes=-N) forms —
                    // an unhandled legal form must answer 416, never
                    // crash the handler and leave the exchange hanging
                    // (the client would block to its timeout)
                    "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r) match {
                      case Some(m) =>
                        val from = m.group(1).toInt
                        val to = Option(m.group(2)).filter(_.nonEmpty)
                          .map(_.toInt).getOrElse(data.length - 1)
                        val slice = data.slice(from, to + 1)
                        ex.getResponseHeaders.add("Content-Range",
                          s"bytes $from-${from + slice.length - 1}/${data.length}")
                        send(206, slice)
                      case None =>
                        "bytes=-(\\d+)".r.findFirstMatchIn(r) match {
                          case Some(s) =>
                            val n = math.min(s.group(1).toInt, data.length)
                            val slice = data.slice(data.length - n, data.length)
                            ex.getResponseHeaders.add("Content-Range",
                              s"bytes ${data.length - n}-${data.length - 1}/${data.length}")
                            send(206, slice)
                          case None => send(416, Array.empty)
                        }
                    }
                  case None => send(200, data)
                }
              case _ => send(405, Array.empty)
            }
          }
        }
      }
    })
    server.start()
    def stop(): Unit = server.stop(0)
  }

  test("s3a end-to-end: ObjectSources reads through the S3 protocol with the env contract") {
    import graft.sources.{ObjectSources, RgwConfig}
    val payload = Array.tabulate(4096)(i => (i % 251).toByte)
    // a real parquet object: reading it over s3a exercises the SEEK path
    // (footer at EOF first, then row groups — random IO via ranged GETs),
    // which sequential text/binary reads never touch
    val parquetBytes = {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("s3a-parquet")
      (0 until 100).map(i => (i.toLong, s"row$i")).toDF("id", "name")
        .coalesce(1).write.mode("overwrite").parquet(dir.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(dir).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.readAllBytes(part)
    }
    val stub = new S3Stub("test-bucket", Map(
      "docs/a.txt" -> "alpha doc body".getBytes("UTF-8"),
      "docs/b.txt" -> "beta doc body longer".getBytes("UTF-8"),
      "docs/c.bin" -> payload,
      "docs/sub/d.txt" -> "nested delta".getBytes("UTF-8"),
      "tables/t.parquet" -> parquetBytes,
      "other/x.txt" -> "outside prefix".getBytes("UTF-8")))
    try {
      // the reference deployment's env contract (pythonvectordbceph.py:49-60)
      val cfg = RgwConfig.fromEnv(Map(
        "BUCKET_HOST" -> "127.0.0.1", "BUCKET_PORT" -> stub.port.toString,
        "AWS_ACCESS_KEY_ID" -> "AKTEST", "AWS_SECRET_ACCESS_KEY" -> "SK")).get
      cfg.apply(spark)
      val hc = spark.sparkContext.hadoopConfiguration
      // no hadoop-aws jar in this sandbox — register the protocol-faithful
      // lite filesystem under the same scheme + conf contract
      hc.set("fs.s3a.impl", classOf[graft.sources.S3LiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")

      val texts = ObjectSources.withObjectKey(
          ObjectSources.textObjects(spark, "s3a://test-bucket/docs/*.txt"),
          "s3a://test-bucket")
        .select("key", "text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(texts == Map(
        "docs/a.txt" -> "alpha doc body",
        "docs/b.txt" -> "beta doc body longer"),
        s"glob over s3a must read exactly the matching objects: $texts")

      val bin = ObjectSources.binaryObjects(spark, "s3a://test-bucket/docs/c.bin")
        .select("content", "length").head()
      assert(bin.getLong(1) == 4096L)
      assert(java.util.Arrays.equals(bin.getAs[Array[Byte]](0), payload),
        "binary content must survive the ranged-GET read path byte-for-byte")

      // parquet over s3a: the footer read seeks to EOF, then row groups —
      // the ranged-GET seek path sequential reads never exercise
      val table = spark.read.parquet("s3a://test-bucket/tables/t.parquet")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(table.size == 100 && table(42L) == "row42",
        "parquet random-IO read over s3a must round-trip every row")

      // protocol contract: path-style addressing, credential attribution,
      // and real pagination (2-entry pages force the continuation loop)
      import scala.jdk.CollectionConverters._
      assert(stub.paths.asScala.forall(p =>
        p == "/test-bucket" || p.startsWith("/test-bucket/")),
        s"every request must be path-style: ${stub.paths.asScala.toSeq.distinct}")
      assert(stub.auths.asScala.forall(_.contains("Credential=AKTEST/")),
        "the configured access key must reach the gateway on every request")
      assert(stub.listPages >= 2,
        s"the 4-entry docs/ listing at 2-entry pages must take >1 page (got ${stub.listPages})")
    } finally {
      stub.stop()
      val hc = spark.sparkContext.hadoopConfiguration
      hc.unset("fs.s3a.impl"); hc.unset("fs.s3a.impl.disable.cache")
    }
  }

  test("s3a write path: TrainingExport and the JSONL sink run end-to-end through the gateway") {
    import graft.sources.{ObjectSources, RgwConfig}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // empty bucket: everything the test reads back was WRITTEN through the
    // S3 protocol (committer-mediated: mkdirs _temporary → PUT task files →
    // COPY+DELETE rename into place → delete _temporary → _SUCCESS) —
    // the reference's write side is put_vectors (pythonvectordbceph.py:194-206)
    val stub = new S3Stub("out-bucket", Map.empty)
    try {
      RgwConfig.fromEnv(Map(
        "BUCKET_HOST" -> "127.0.0.1", "BUCKET_PORT" -> stub.port.toString,
        "AWS_ACCESS_KEY_ID" -> "AKWRITE", "AWS_SECRET_ACCESS_KEY" -> "SK")).get.apply(spark)
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3a.impl", classOf[graft.sources.S3LiteFileSystem].getName)
      hc.set("fs.s3a.impl.disable.cache", "true")
      // mapred-default binds scheme s3a to S3ACommitterFactory (hadoop-aws,
      // absent here) — write through the classic rename-based committer,
      // which is exactly the protocol S3LiteFileSystem implements
      hc.set("mapreduce.outputcommitter.factory.scheme.s3a",
        "org.apache.hadoop.mapreduce.lib.output.FileOutputCommitterFactory")

      val docs = (0 until 60).map { i =>
        val text = (0 to i % 7).map(j => s"w${(i + j) % 11}").mkString(" ")
        (i.toLong, text, if (i % 3 == 0) "en" else "de", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "n_chars")

      val stats = graft.pipeline.TrainingExport.run(
        spark, docs, "s3a://out-bucket/export",
        graft.pipeline.TrainingExport.Config(budgetTokens = 16, shards = 4))
      assert(stats.docsKept > 0, "export must keep documents")
      assert(stub.store.contains("export/_SUCCESS"),
        "job commit must reach the gateway (committer protocol completed)")
      assert(!stub.store.keys.exists(_.contains("_temporary/")),
        s"commit must clean the staging keys: ${stub.store.keys.filter(_.contains("_temporary"))}")

      val back = spark.read.parquet("s3a://out-bucket/export")
      assert(back.count() == stats.docsKept,
        "every exported row must read back through the gateway")
      // the partitionBy(shard) layout survives: a one-shard read PUTs a
      // partition filter on the s3a scan, not a full-bucket scan
      val oneShard = spark.read.parquet("s3a://out-bucket/export")
        .filter(col("shard") === 1)
      assert(oneShard.queryExecution.executedPlan.toString.contains("PartitionFilters"),
        "shard read over s3a must keep partition pruning")
      assert(oneShard.count() > 0)

      // loader-facing JSONL sink over the same gateway, then round-trip
      ObjectSources.writeJsonlSharded(
        back.select(col("shard"), col("doc_id"), col("text")),
        "s3a://out-bucket/jsonl")
      assert(stub.store.keys.exists(k =>
          k.startsWith("jsonl/shard=") && k.endsWith(".json.gz")),
        s"JSONL sink must land gzip shard objects: ${stub.store.keys.filter(_.startsWith("jsonl/")).take(5)}")
      val jl = spark.read.json("s3a://out-bucket/jsonl")
      assert(jl.count() == stats.docsKept, "JSONL round-trip must keep every row")
      val sample = back.orderBy(col("doc_id")).limit(1)
        .select(col("doc_id"), col("text")).head()
      assert(jl.filter(col("doc_id") === sample.getLong(0)).head()
        .getAs[String]("text") == sample.getString(1),
        "document text must survive the gzip JSONL round-trip byte-for-byte")

      // HDFS directory contract over `key/` markers: an EMPTY subdirectory
      // survives rename, and non-recursive delete refuses a dir holding it
      import org.apache.hadoop.fs.Path
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("s3a://out-bucket/"), hc)
      fs.mkdirs(new Path("s3a://out-bucket/mv/sub"))
      assert(fs.rename(new Path("s3a://out-bucket/mv"), new Path("s3a://out-bucket/mv2")))
      assert(fs.getFileStatus(new Path("s3a://out-bucket/mv2/sub")).isDirectory,
        "an empty subdirectory must survive a directory rename")
      intercept[java.io.IOException] {
        fs.delete(new Path("s3a://out-bucket/mv2"), false)
      }
      assert(fs.delete(new Path("s3a://out-bucket/mv2"), true))
      intercept[java.io.FileNotFoundException] {
        fs.getFileStatus(new Path("s3a://out-bucket/mv2/sub"))
      }

      // mkdirs over an existing FILE (at the path or an ancestor) must
      // throw per the HDFS contract — silently PUTting the `key/` marker
      // would create a same-named file and directory, and children under
      // the "directory" become invisible (HEAD resolves the file first)
      assert(stub.store.contains("export/_SUCCESS"))
      intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
        fs.mkdirs(new Path("s3a://out-bucket/export/_SUCCESS"))
      }
      intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
        fs.mkdirs(new Path("s3a://out-bucket/export/_SUCCESS/child"))
      }
      assert(!stub.store.contains("export/_SUCCESS/"),
        "a refused mkdirs must not leave a directory marker behind")

      // S3 LOAD SHEDDING: from here on the gateway 503s the FIRST
      // attempt of every distinct request. At fleet scale some fraction
      // of requests always sees shedding — the client's bounded-backoff
      // retry must absorb it invisibly: writes commit, reads stay
      // byte-exact, nothing leaks into results. Every single operation
      // of the write+read below fails once, so success proves retry
      // works on every path — deterministically, under any parallelism.
      stub.shedFirstAttempts = true
      val chaosDf = back.select(col("doc_id"), col("text"))
      chaosDf.coalesce(1).write.parquet("s3a://out-bucket/chaos")
      val chaosBack = spark.read.parquet("s3a://out-bucket/chaos")
      assert(chaosBack.count() == stats.docsKept,
        "a write through 33% shedding must commit every row exactly once")
      assert(chaosBack.agg(sum(col("doc_id"))).head().getLong(0) ==
          chaosDf.agg(sum(col("doc_id"))).head().getLong(0),
        "rows read through shedding must be byte-exact, not resent/partial")
      stub.shedFirstAttempts = false
      assert(stub.shedCount > 0, "the chaos injection must actually have fired")
    } finally {
      stub.stop()
      val hc = spark.sparkContext.hadoopConfiguration
      hc.unset("fs.s3a.impl"); hc.unset("fs.s3a.impl.disable.cache")
      hc.unset("mapreduce.outputcommitter.factory.scheme.s3a")
    }
  }

  // ---- SQL surface (A16/A17 from pure SQL, mirroring describe.py) ----

  test("registerSqlViews: the describe.py flow works from plain SQL") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sql").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("texts_a", dim = 4, metric = "l2",
      indexType = "IVF_FLAT", nlist = 8)
    client.createCollection("texts_b", dim = 2, metric = "cosine")
    client.upsert("texts_a", Seq(
      ("k1", Seq(1f, 0f, 0f, 0f), Map("cat" -> "x")),
      ("k2", Seq(0f, 1f, 0f, 0f), Map("cat" -> "y"))).toDF("key", "vec", "meta"))
    client.registerSqlViews()

    // list_collections + describe_collection + describe_index in one query
    val descr = spark.sql(
      """SELECT name, dim, metric, indexType, nlist FROM graft_collections
        |ORDER BY name""".stripMargin).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getInt(4)))
    assert(descr.toSeq == Seq(
      ("texts_a", 4, "l2", "IVF_FLAT", 8),
      ("texts_b", 2, "cosine", "FLAT", 0)))

    // query the collection itself (describe.py:28-33's sample query)
    val rows = spark.sql(
      "SELECT key, element_at(meta, 'cat') AS cat FROM texts_a ORDER BY key")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("k1", "x"), ("k2", "y")))

    // views advance on re-registration after a write
    client.upsert("texts_a",
      Seq(("k3", Seq(0f, 0f, 1f, 0f), Map("cat" -> "z"))).toDF("key", "vec", "meta"))
    client.registerSqlViews()
    assert(spark.sql("SELECT count(*) AS n FROM texts_a").head().getLong(0) == 3)
  }

  test("registerSqlViews: names colliding after '-'→'_' sanitization fail loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-sqlc").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("docs-a", dim = 2)
    client.createCollection("docs_a", dim = 2)
    // both sanitize to view `docs_a` — the later registration would
    // silently shadow the earlier one's view without the guard
    val err = intercept[IllegalArgumentException](client.registerSqlViews())
    assert(err.getMessage.contains("docs-a") && err.getMessage.contains("docs_a"))
  }

  // ---- HTTP landing adapter (A1) + external-inference hook (A4 remote) ----

  test("LandingReceiver: posted notifications land and ingest end-to-end") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-recv").toString
    val recv = new graft.streaming.LandingReceiver(s"$root/landing")
    try {
      def post(json: String): Int = {
        val conn = new java.net.URI(s"http://localhost:${recv.boundPort}/")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(json.getBytes("UTF-8"))
        val c = conn.getResponseCode; conn.disconnect(); c
      }
      def notif(eventName: String, key: String): String =
        TestDirs.notif(eventName, key, bucket = "bkt")
      assert(post(notif("ObjectCreated:Put", "a.txt")) == 200)
      assert(post(notif("ObjectCreated:Put", "b.txt")) == 200)
      assert(post(notif("ObjectRemoved:Delete", "a.txt")) == 200)

      val client = new graft.api.GraftClient(spark, root)
      val emb = HashingEmbedder(16)
      client.createCollection("recvd", dim = 16)
      val objects = Seq(("a.txt", "alpha doc"), ("b.txt", "beta doc")).toDF("key", "text")
      client.startIngest("recvd", s"$root/landing", objects, embedder = emb)
        .awaitTermination(120000)
      val keys = client.search("recvd", emb.embedText("doc"), 10).collect()
        .map(_.getAs[String]("vector_key")).toSet
      assert(keys == Set("b.txt"), s"delete-after-put must hold over HTTP posts: $keys")

      // GETs are rejected like the reference's POST-only handler
      val g = new java.net.URI(s"http://localhost:${recv.boundPort}/")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(g.getResponseCode == 405)
      g.disconnect()
    } finally recv.stop()
  }

  test("LandingReceiver: stray landing files don't break counter resume") {
    val landing = java.nio.file.Files.createTempDirectory("graft-stray")
    // a non-numeric evt file (user-dropped) plus a real one the counter
    // must resume AFTER — the constructor used to throw on the stray
    java.nio.file.Files.write(landing.resolve("evt-test.json"), "{}".getBytes)
    java.nio.file.Files.write(
      landing.resolve("evt-000000000007.json"), "{}".getBytes)
    val recv = new graft.streaming.LandingReceiver(landing.toString)
    try {
      val conn = new java.net.URI(s"http://localhost:${recv.boundPort}/")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write("{}".getBytes("UTF-8"))
      assert(conn.getResponseCode == 200); conn.disconnect()
      assert(java.nio.file.Files.exists(landing.resolve("evt-000000000008.json")),
        "counter resumes after the max NUMERIC landing file")
    } finally recv.stop()
  }

  test("RemoteEmbedder: malformed service responses fail loudly, not silently") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    @volatile var mode = "short" // short | wrongdim | error
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/embed", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      if (mode == "error") {
        val b = "boom".getBytes; ex.sendResponseHeaders(503, b.length)
        ex.getResponseBody.write(b); ex.close()
      } else {
        val out = mapper.createObjectNode()
        val vecs = out.putArray("vectors")
        val arr = vecs.addArray()
        (0 until (if (mode == "wrongdim") 3 else 4)).foreach(_ => arr.add(0.5))
        val bytes = mapper.writeValueAsBytes(out)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.start()
    try {
      val remote = graft.ingest.RemoteEmbedder(
        s"http://localhost:${server.getAddress.getPort}/embed", dim = 4, batchSize = 8)
      // fewer vectors than inputs → a silent drop would misalign every
      // row after the gap; must throw instead
      val short = intercept[IllegalArgumentException] {
        remote.embedTexts(Seq("a", "b"))
      }
      assert(short.getMessage.contains("1 vectors for 2 inputs"), short.getMessage)
      mode = "wrongdim"
      val dim = intercept[IllegalArgumentException] { remote.embedText("a") }
      assert(dim.getMessage.contains("dimension 3"), dim.getMessage)
      mode = "error"
      val err = intercept[java.io.IOException] { remote.embedText("a") }
      assert(err.getMessage.contains("503") && err.getMessage.contains("boom"),
        err.getMessage)
    } finally server.stop(0)
  }

  test("RemoteEmbedder: batched per-partition calls against a stub service") {
    import spark.implicits._
    val served = new java.util.concurrent.atomic.AtomicInteger(0)
    val kernel = HashingEmbedder(8) // the stub "model"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/embed", (ex: com.sun.net.httpserver.HttpExchange) => {
      served.incrementAndGet()
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      val out = mapper.createObjectNode()
      val vecs = out.putArray("vectors")
      val inputs = req.get("inputs")
      (0 until inputs.size()).foreach { i =>
        val item = inputs.get(i)
        val v = if (item.has("text")) kernel.embedText(item.get("text").asText())
          else kernel.embedBytes(java.util.Base64.getDecoder.decode(item.get("bytes_b64").asText()))
        val arr = vecs.addArray()
        v.foreach(arr.add)
      }
      val bytes = mapper.writeValueAsBytes(out)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://localhost:${server.getAddress.getPort}/embed"
      val remote = graft.ingest.RemoteEmbedder(url, dim = 8, batchSize = 4)

      // the config gate: endpoint set → remote; unset → hashing stand-in
      spark.conf.set("spark.graft.embedder.endpoint", url)
      spark.conf.set("spark.graft.embedder.batchSize", "4")
      assert(Embedder.configured(spark, 8) == graft.ingest.RemoteEmbedder(url, 8, 4))
      spark.conf.unset("spark.graft.embedder.endpoint")
      assert(Embedder.configured(spark, 8) == HashingEmbedder(8))

      val docs = (0 until 10).map(i => (s"k$i", if (i == 7) null else s"doc number $i"))
        .toDF("key", "text").repartition(1)
      val embedded = Embedder.embedDocuments(docs, "text", remote)
        .collect().map(r => r.getAs[String]("key") -> Option(r.getSeq[Float](2))).toMap
      assert(embedded("k7").isEmpty, "null text embeds to null without a call")
      (0 until 10).filter(_ != 7).foreach { i =>
        assert(embedded(s"k$i").get == kernel.embedText(s"doc number $i").toSeq,
          s"k$i: remote vector must equal the service's kernel output")
      }
      // 9 non-null rows at batchSize 4 in one partition = 3 requests, not 9
      assert(served.get() == 3, s"expected 3 batched calls, saw ${served.get()}")

      // bytes path round-trips too
      assert(remote.embedBytes(Array[Byte](1, 2, 3, 4)).toSeq ==
        kernel.embedBytes(Array[Byte](1, 2, 3, 4)).toSeq)

      // the STREAMING embed boundary (embedObjects — mixed text/bytes
      // dispatch) must batch too: one request per row-chunk, text and
      // binary items in the same round-trip, no-modality rows → null
      served.set(0)
      val mixed = Seq(
        ("t1", Some("text one"), Option.empty[Array[Byte]]),
        ("b1", Option.empty[String], Some(Array[Byte](1, 2, 3, 4))),
        ("t2", Some("text two"), Option.empty[Array[Byte]]),
        ("x1", Option.empty[String], Option.empty[Array[Byte]]),
        ("b2", Option.empty[String], Some(Array[Byte](5, 6, 7, 8)))
      ).toDF("key", "text", "bytes").repartition(1)
      val objVecs = Embedder.embedObjects(mixed, remote)
        .collect().map(r => r.getAs[String]("key") -> Option(r.getSeq[Float](3))).toMap
      assert(objVecs("t1").get == kernel.embedText("text one").toSeq)
      assert(objVecs("b1").get == kernel.embedBytes(Array[Byte](1, 2, 3, 4)).toSeq)
      assert(objVecs("b2").get == kernel.embedBytes(Array[Byte](5, 6, 7, 8)).toSeq)
      assert(objVecs("x1").isEmpty, "no-modality rows embed to null (the 400 arm)")
      assert(served.get() == 2,
        s"5 rows at batchSize 4 = two row-chunks = 2 mixed requests (not 4 " +
          s"per-item RPCs), saw ${served.get()}")
    } finally server.stop(0)
  }

  test("RemoteSparseFeaturizer: batched per-partition calls against a " +
       "stub SPLADE-shaped service; config gate; null/empty rejection") {
    import spark.implicits._
    import graft.ingest.{SparseFeaturizer, RemoteSparseFeaturizer, HashingTfFeaturizer}
    val served = new java.util.concurrent.atomic.AtomicInteger(0)
    val kernel = HashingTfFeaturizer() // the stub "model"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/featurize", (ex: com.sun.net.httpserver.HttpExchange) => {
      served.incrementAndGet()
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      val out = mapper.createObjectNode()
      val vecs = out.putArray("vectors")
      val inputs = req.get("inputs")
      (0 until inputs.size()).foreach { i =>
        val m = kernel.featurize(inputs.get(i).get("text").asText())
        val node = vecs.addObject()
        val idx = node.putArray("indices"); val vals = node.putArray("values")
        m.toSeq.sortBy(_._1).foreach { case (d, w) => idx.add(d); vals.add(w) }
      }
      val bytes = mapper.writeValueAsBytes(out)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://localhost:${server.getAddress.getPort}/featurize"
      val remote = RemoteSparseFeaturizer(url, batchSize = 4)

      // the config gate: endpoint set → remote; unset → hashing-TF
      spark.conf.set("spark.graft.featurizer.endpoint", url)
      spark.conf.set("spark.graft.featurizer.batchSize", "4")
      assert(SparseFeaturizer.configured(spark) == RemoteSparseFeaturizer(url, 4))
      spark.conf.unset("spark.graft.featurizer.endpoint")
      assert(SparseFeaturizer.configured(spark) == SparseFeaturizer.hashingTf)

      // 10 rows at batchSize 4 in one partition = 3 row-chunks = 3
      // requests; a null text skips its batch slot entirely, and a
      // whitespace-only text (empty feature set from the service)
      // lands a null vec — both feed the ingest rejection arm
      val docs = (0 until 10).map(i => (s"k$i",
          if (i == 7) null else if (i == 3) "   " else s"doc number $i"))
        .toDF("key", "text").repartition(1)
      val feats = SparseFeaturizer.featurizeDocuments(docs, "text", remote)
        .collect()
        .map(r => r.getAs[String]("key") ->
          Option(r.getAs[Map[Long, Double]]("vec"))).toMap
      assert(feats("k7").isEmpty, "null text featurizes to null without a call")
      assert(feats("k3").isEmpty, "an empty feature set maps to null (rejection arm)")
      (0 until 10).filterNot(Set(3, 7)).foreach { i =>
        assert(feats(s"k$i").get == kernel.featurize(s"doc number $i"),
          s"k$i: remote sparse vector must equal the service kernel's output")
      }
      assert(served.get() == 3, s"expected 3 batched calls, saw ${served.get()}")
    } finally server.stop(0)
  }
}
