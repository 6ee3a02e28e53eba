package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pipeline (LLM-data-pipeline mandate): image/audio/video
  * as opaque `binary` columns with typed metadata, processed per-partition.
  *
  * IMAGES decode for real: `javax.imageio` (JDK built-in, PNG/JPEG/GIF/BMP)
  * parses the container and hands the feature step actual pixels — the
  * reference's image arm reads real pixels the same way (PIL + timm
  * preprocessing, `s3vectors-app/pythonvectordbceph.py:164-169`).
  * AUDIO decodes for real too (r10): `javax.sound.sampled` (JDK built-in)
  * parses WAV/AIFF/AU PCM containers and the feature step sees actual
  * SAMPLES — mono-mixed 16-bit — so two containers carrying the same PCM
  * embed identically, exactly the image arm's decoded-pixels contract.
  * VIDEO splits the honest middle (r10): the MP4 CONTAINER parses for
  * real — a bounds-checked ISO-BMFF box walk reads the track's true
  * geometry (tkhd) and frame count (stts) — while frame/pixel DECODE
  * remains a clearly-marked stub: this container has no H.264/AV1 codec
  * (cf. §7.0 offline constraint; compressed audio like mp3 likewise
  * stubs — the JDK SPI only ships PCM).
  * ANIMATED GIFs close part of that gap for real (r11): the JDK ships a
  * full GIF codec, so the multi-frame pipeline — composite delta frames
  * per the GIF89a disposal spec, sample every Nth frame, embed each,
  * temporal mean-pool — runs on actual decoded pixels end to end
  * ([[decodeGifFrames]]); H.264/AV1/MP3 remain the boundary.
  * Everything around it is the real Spark plumbing: schema, typed Dataset
  * transform, per-partition amortized setup, batch shape. The `decoded`
  * flag separates codec-parsed rows from stubbed/corrupt ones, so a
  * downstream filter can quarantine undecodable media instead of training
  * on fabricated dimensions.
  *
  * Scale posture: `mapPartitions` keeps decoder/model instantiation
  * per-task, rows stream through without materializing a partition in
  * memory, and the output is a normal columnar DataFrame that downstream
  * embedding/dedup operators consume. Heavy media work would raise
  * `spark.sql.files.maxPartitionBytes`-driven task counts, not driver load.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  case class MediaObject(key: String, mediaType: String, content: Array[Byte])

  /** Decoded frame/sample features — fixed shape, schema-stable.
    * `decoded` = a real codec parsed the payload (vs stub dims for
    * video/compressed-audio and corrupt images). Field mapping by
    * modality (one schema for the whole media frame — downstream
    * operators union modalities without a per-type struct):
    *   - image: (width, height) = pixels, nFrames = 1;
    *   - audio: width = SAMPLE RATE (Hz), height = CHANNELS in the
    *     source container, nFrames = PCM sample frames (so
    *     nFrames/width = duration in seconds and [[sampleFrameIndexes]]
    *     strides over samples);
    *   - video: REAL container metadata when the MP4 parses (tkhd
    *     geometry, stts frame count; `decoded` stays false — features
    *     hash container bytes, not codec output); else the
    *     deterministic stub dims + frame count. */
  case class MediaFeatures(
      key: String,
      mediaType: String,
      byteLength: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      decoded: Boolean,
      features: Array[Float])

  /** Real image decode via the JDK's ImageIO: (width, height, row-major
    * RGB bytes). None = the payload is not a decodable image (corrupt or
    * an unsupported format) — callers must not fabricate dimensions for
    * it silently. */
  /** Max header-claimed pixel count accepted by [[decodeImage]] — a
    * dimension cap enforced BEFORE any pixel allocation, so a crafted
    * "decompression bomb" header (e.g. 100000×100000) is rejected for the
    * cost of a header read, never an executor OOM. 64 MPx ≈ a 192 MB RGB
    * buffer, far above any embedding input. */
  private[ingest] val MaxPixels: Long = 64L * 1024 * 1024

  private[ingest] def decodeImage(content: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            // header-only dimension read: reject bombs BEFORE decoding
            val (w, h) = (reader.getWidth(0), reader.getHeight(0))
            if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
            else {
              val img = reader.read(0)
              // one bulk fetch — per-pixel getRGB pays a color-model
              // conversion call per pixel on the ingest hot path
              val rgb = img.getRGB(0, 0, w, h, null, 0, w)
              val px = new Array[Byte](w * h * 3)
              var i = 0
              var p = 0
              while (p < rgb.length) {
                val v = rgb(p)
                px(i) = ((v >> 16) & 0xff).toByte
                px(i + 1) = ((v >> 8) & 0xff).toByte
                px(i + 2) = (v & 0xff).toByte
                i += 3; p += 1
              }
              Some((w, h, px))
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch {
      // ImageIO plugins throw RuntimeExceptions (IndexOutOfBounds,
      // IllegalArgument, ...) on crafted/corrupt payloads, not just
      // IOException — ANY decode failure means "quarantine via
      // decoded=false", never "abort the ingest job over one image"
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Frame-count budget for animated decode — with the [[MaxPixels]]
    * canvas cap this bounds the total composited pixel work per payload;
    * a GIF claiming more frames is truncated there (the decoded prefix
    * is still real codec output, and `nFrames` reports what was
    * composited). */
  private[ingest] val MaxAnimFrames: Int = 1024

  private def isGif(content: Array[Byte]): Boolean =
    content.length >= 6 && content(0) == 'G' && content(1) == 'I' &&
      content(2) == 'F' && content(3) == '8'

  /** Real ANIMATED-GIF decode (r11): the one compressed multi-frame
    * format the JDK ships a codec for, so the video-shaped pipeline gets
    * actual per-frame pixels instead of container hashes. Frames are
    * COMPOSITED per the GIF89a spec — each frame draws at its
    * ImageDescriptor offset onto the logical-screen canvas and its
    * GraphicControlExtension disposal applies afterwards
    * (doNotDispose accumulates, restoreToBackgroundColor clears the
    * frame's rect, restoreToPrevious reverts the canvas) — because delta
    * frames are diffs, not images: embedding raw rasters would hash
    * encoder ephemera. Returns (canvasW, canvasH, framesComposited,
    * every `stride`-th composited frame as row-major RGB over black).
    * Same bomb posture as [[decodeImage]]: the canvas dimension check
    * runs before any allocation, the frame loop is budget-capped, and
    * any plugin throw quarantines via None.
    *
    * Disposal-color choice: `restoreToBackgroundColor` clears the frame
    * rect to TRANSPARENT (flattened over black by the sampler) rather
    * than filling with the logical-screen background color index —
    * the browser-rendering convention (every major browser ignores the
    * background color index), not strict GIF89a. A GIF that relies on a
    * non-black background color index therefore embeds as if that
    * background were black; deterministic either way, but spec-exact
    * compositing would read the index from the stream metadata's global
    * color table and fill with it. */
  private[graft] def decodeGifFrames(content: Array[Byte], stride: Int = 1)
      : Option[(Int, Int, Int, Seq[Array[Byte]])] = {
    require(stride >= 1, s"stride must be >= 1 (got $stride)")
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          if (!reader.getFormatName.equalsIgnoreCase("gif")) return None
          reader.setInput(iis)
          // logical screen from the STREAM metadata; fall back to frame 0
          def attr(e: org.w3c.dom.Element, tag: String, a: String): Option[Int] = {
            val ns = e.getElementsByTagName(tag)
            if (ns.getLength == 0) None
            else Option(ns.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute(a))
              .filter(_.nonEmpty).flatMap(_.toIntOption)
          }
          val streamTree = Option(reader.getStreamMetadata)
            .map(_.getAsTree("javax_imageio_gif_stream_1.0")
              .asInstanceOf[org.w3c.dom.Element])
          val cw = streamTree.flatMap(attr(_, "LogicalScreenDescriptor",
            "logicalScreenWidth")).getOrElse(reader.getWidth(0))
          val ch = streamTree.flatMap(attr(_, "LogicalScreenDescriptor",
            "logicalScreenHeight")).getOrElse(reader.getHeight(0))
          if (cw <= 0 || ch <= 0 || cw.toLong * ch > MaxPixels) return None
          val canvas = new java.awt.image.BufferedImage(
            cw, ch, java.awt.image.BufferedImage.TYPE_INT_ARGB)
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          def sampleCanvas(): Array[Byte] = {
            // flatten ARGB over black — the deterministic background the
            // features contract documents (GIF transparency has no
            // universal background; black matches the RGB feature space)
            val ints = canvas.getRGB(0, 0, cw, ch, null, 0, cw)
            val px = new Array[Byte](cw * ch * 3)
            var i = 0; var p = 0
            while (p < ints.length) {
              val v = ints(p)
              val a = (v >>> 24) & 0xff
              px(i) = (((v >> 16) & 0xff) * a / 255).toByte
              px(i + 1) = (((v >> 8) & 0xff) * a / 255).toByte
              px(i + 2) = ((v & 0xff) * a / 255).toByte
              i += 3; p += 1
            }
            px
          }
          var i = 0
          var done = false
          while (!done && i < MaxAnimFrames) {
            val frame =
              try reader.read(i)
              catch { case _: IndexOutOfBoundsException => done = true; null }
            if (!done) {
              val tree = reader.getImageMetadata(i)
                .getAsTree("javax_imageio_gif_image_1.0")
                .asInstanceOf[org.w3c.dom.Element]
              val x = attr(tree, "ImageDescriptor", "imageLeftPosition").getOrElse(0)
              val y = attr(tree, "ImageDescriptor", "imageTopPosition").getOrElse(0)
              val disposal = {
                val ns = tree.getElementsByTagName("GraphicControlExtension")
                if (ns.getLength == 0) "none"
                else ns.item(0).asInstanceOf[org.w3c.dom.Element]
                  .getAttribute("disposalMethod")
              }
              val before =
                if (disposal == "restoreToPrevious")
                  Some(canvas.getRGB(0, 0, cw, ch, null, 0, cw))
                else None
              val g = canvas.createGraphics()
              try g.drawImage(frame, x, y, null) finally g.dispose()
              if (i % stride == 0) out += sampleCanvas()
              disposal match {
                case "restoreToBackgroundColor" =>
                  val g2 = canvas.createGraphics()
                  try {
                    g2.setComposite(java.awt.AlphaComposite.Clear)
                    g2.fillRect(x, y, frame.getWidth, frame.getHeight)
                  } finally g2.dispose()
                case "restoreToPrevious" =>
                  before.foreach(canvas.setRGB(0, 0, cw, ch, _, 0, cw))
                case _ => // none / doNotDispose: accumulate
              }
              i += 1
            }
          }
          if (i == 0 || out.isEmpty) None else Some((cw, ch, i, out.toSeq))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Byte budget [[decodeAudio]] accepts before allocating — the audio
    * twin of [[MaxPixels]]: a crafted header claiming hours of PCM is
    * rejected for the cost of a header read (64 MB ≈ 6 min of 44.1 kHz
    * stereo 16-bit — far above any embedding input). */
  private[ingest] val MaxAudioBytes: Long = 64L * 1024 * 1024

  /** Real audio decode via the JDK's sampled-sound SPI (WAV/AIFF/AU, PCM
    * 8/16-bit): (sampleRate, channels, sampleFrames, mono 16-bit LE
    * samples). Channels mix to mono by averaging BEFORE embedding, so
    * the features depend on the recorded signal, not the channel layout
    * — and two containers carrying the same PCM embed identically (the
    * image arm's decoded-pixels contract). None = not a decodable PCM
    * container (compressed audio, corrupt bytes, or a header past the
    * byte budget) — callers quarantine via decoded=false, exactly like
    * corrupt images. */
  private[ingest] def decodeAudio(content: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val frames = in.getFrameLength
        val frameSize = fmt.getFrameSize
        if (!(signed || unsigned) || (bits != 8 && bits != 16) ||
            ch <= 0 || frames <= 0 || frameSize <= 0 ||
            frames * frameSize.toLong > MaxAudioBytes ||
            fmt.getSampleRate <= 0f) None
        else {
          val bytes = in.readAllBytes()
          val n = math.min(frames, bytes.length.toLong / frameSize).toInt
          if (n <= 0) None
          else {
            val bps = bits / 8
            val big = fmt.isBigEndian
            val mono = new Array[Byte](n * 2)
            var f = 0
            while (f < n) {
              var acc = 0
              var c = 0
              while (c < ch) {
                val off = f * frameSize + c * bps
                val s =
                  if (bps == 1)
                    (if (unsigned) (bytes(off) & 0xff) - 128
                     else bytes(off).toInt) << 8 // widen 8-bit to 16-bit scale
                  else {
                    val raw =
                      if (big) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                      else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
                    if (unsigned) ((raw & 0xffff) - 32768) else raw
                  }
                acc += s
                c += 1
              }
              val m = acc / ch
              mono(2 * f) = (m & 0xff).toByte
              mono(2 * f + 1) = ((m >> 8) & 0xff).toByte
              f += 1
            }
            Some((fmt.getSampleRate.toInt, ch, n, mono))
          }
        }
      } finally in.close()
    } catch {
      // the SPI throws UnsupportedAudioFileException on non-audio bytes
      // and assorted RuntimeExceptions on crafted headers — any failure
      // means quarantine, never an aborted ingest job
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Real MP4/ISO-BMFF CONTAINER parse (r10): walk the box tree and
    * read the video track's true geometry and sample count —
    * (width, height, nFrames) from `tkhd` (16.16 fixed-point dims) and
    * `stts` (Σ sample_count over the time-to-sample entries). This is a
    * header-structure parse, NOT a codec: the pixel/frame DECODE remains
    * the documented external boundary (no H.264/AV1 in this container —
    * §7.0), so video features still hash the container bytes. What the
    * parse buys is honest METADATA — real dimensions, real frame counts,
    * real `sampleFrameIndexes` strides — instead of stub arithmetic.
    * Robustness: box sizes are validated against the enclosing extent
    * before any recursion (a crafted size can neither loop nor read out
    * of bounds), recursion depth and per-level box count are capped, and
    * 64-bit extended sizes are rejected (no legitimate moov needs one).
    * None = not a parseable MP4 container → the deterministic stub. */
  private[ingest] def decodeVideoMeta(content: Array[Byte]): Option[(Int, Int, Int)] = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var w = 0
    var h = 0
    var frames = 0L
    def u32(off: Int): Long =
      ((content(off) & 0xffL) << 24) | ((content(off + 1) & 0xffL) << 16) |
        ((content(off + 2) & 0xffL) << 8) | (content(off + 3) & 0xffL)
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return
      var off = start
      var boxes = 0
      while (off + 8 <= end && boxes < 1024) {
        val size = u32(off)
        if (size < 8 || off + size > end) return // crafted/torn box: stop
        val tpe = new String(content, off + 4, 4, "ISO-8859-1")
        val pay = off + 8
        val boxEnd = (off + size).toInt
        tpe match {
          case t if containers(t) => walk(pay, boxEnd, depth + 1)
          case "tkhd" if pay < content.length =>
            // v0 payload: ver/flags 4, times 8, id 4, res 4, dur 4,
            // res 8, layer/alt/vol/res 8, matrix 36 → width at 76;
            // v1 widens the three times/duration by 12 bytes
            val v = content(pay) & 0xff
            val wOff = pay + (if (v == 1) 88 else 76)
            if (wOff + 8 <= boxEnd) {
              val tw = (u32(wOff) >> 16).toInt // 16.16 fixed-point
              val th = (u32(wOff + 4) >> 16).toInt
              // audio tracks carry 0×0 — keep the first VIDEO track's dims
              if (tw > 0 && th > 0 && tw <= 16384 && th <= 16384 && w == 0) {
                w = tw; h = th
              }
            }
          case "stts" if pay + 8 <= boxEnd =>
            val n = u32(pay + 4)
            var i = 0L
            var tot = 0L
            while (i < n && pay + 8 + i * 8 + 8 <= boxEnd) {
              tot += u32((pay + 8 + i * 8).toInt) // sample_count
              i += 1
            }
            if (tot > frames && tot <= Int.MaxValue) frames = tot
          case _ => // leaf box we don't need (mdat, ftyp, codecs, …)
        }
        off = boxEnd
        boxes += 1
      }
    }
    try {
      walk(0, content.length, 0)
      if (w > 0 && h > 0) Some((w, h, math.max(1L, frames).toInt)) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB decode for unparseable video/compressed audio (and the
    * corrupt-media fallback): the deterministic fake derives
    * "dimensions" and a frame count from the payload bytes so tests are
    * stable, and is loudly not a codec. */
  private[ingest] def decodeStub(m: MediaObject): (Int, Int, Int) = {
    val n = m.content.length
    val w = 16 + math.floorMod(if (n > 0) m.content(0).toInt else 0, 16)
    val h = 16 + math.floorMod(if (n > 1) m.content(1).toInt else 0, 16)
    val frames = m.mediaType match {
      case "video" => 1 + n / 1024
      case "audio" => 1 + n / 512
      case _       => 1
    }
    (w, h, frames)
  }

  /** Real pixel resample (JDK `Graphics2D`, bilinear): scale row-major RGB
    * pixels into the (maxW, maxH) box preserving aspect ratio, never
    * upscaling — the letterbox arithmetic AND the resample real image
    * pipelines run before the model (the reference's TIMM preprocess,
    * `s3vectors-app/pythonvectordbceph.py:164-169`). Headless-safe:
    * BufferedImage raster ops need no display. */
  /** The letterbox dimension contract, in ONE place: scale (w, h) into
    * the (maxW, maxH) box preserving aspect ratio, never upscaling. Every
    * resize surface — real pixel resample, stub-row arithmetic,
    * metadata-level [[resize]] — must agree on these numbers or the
    * stub/real/metadata dimensions silently diverge. */
  private[ingest] def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, math.round(w * scale).toInt),
      math.max(1, math.round(h * scale).toInt))
  }

  private[ingest] def resamplePixels(w: Int, h: Int, px: Array[Byte],
      maxW: Int, maxH: Int): (Int, Int, Array[Byte]) = {
    val (tw, th) = fitBox(w, h, maxW, maxH)
    if (tw == w && th == h) (w, h, px)
    else {
      val src = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val ints = new Array[Int](w * h)
      var p = 0
      while (p < ints.length) {
        ints(p) = ((px(3 * p) & 0xff) << 16) |
          ((px(3 * p + 1) & 0xff) << 8) | (px(3 * p + 2) & 0xff)
        p += 1
      }
      src.setRGB(0, 0, w, h, ints, 0, w)
      val dst = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, tw, th, null)
      } finally g.dispose()
      val out = dst.getRGB(0, 0, tw, th, null, 0, tw)
      val bytes = new Array[Byte](tw * th * 3)
      var i = 0
      p = 0
      while (p < out.length) {
        val v = out(p)
        bytes(i) = ((v >> 16) & 0xff).toByte
        bytes(i + 1) = ((v >> 8) & 0xff).toByte
        bytes(i + 2) = (v & 0xff).toByte
        i += 3; p += 1
      }
      (tw, th, bytes)
    }
  }

  /** Decode + feature-extract over a typed Dataset. One decoder/embedder
    * instantiation per partition (the reference re-instantiates per event —
    * `pythonvectordbceph.py:162,168`). Image features are computed over
    * the DECODED PIXELS (not the container bytes), so two encodings of
    * the same image embed identically. `resizeTo = Some((w, h))` runs the
    * REAL bilinear resample on decoded images before embedding — model
    * input normalization as part of the scan, so the embedder sees a
    * bounded buffer regardless of source resolution; stub rows get the
    * same dimension arithmetic (no pixels exist to resample). */
  def extractFeatures(ds: Dataset[MediaObject], dim: Int = Embedder.ImageDim,
      resizeTo: Option[(Int, Int)] = None,
      frameStride: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    resizeTo.foreach { case (mw, mh) => require(mw > 0 && mh > 0) }
    require(frameStride >= 1, s"frameStride must be >= 1 (got $frameStride)")
    ds.mapPartitions { it =>
      val embedder = HashingEmbedder(dim) // per-partition setup, not per-row
      // ImageIO's default temp-FILE stream cache is pure overhead for
      // in-memory payloads on executors
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        // GIFs take the multi-frame path (r11): real composited frames,
        // every frameStride-th one embedded, temporal MEAN POOL
        // re-normalized — the per-frame-model + mean-pool shape a real
        // video embedder has. A single-frame GIF is the n=1 case of the
        // same path (one decode; a 1-frame "pool" bypasses the mean
        // arithmetic below so its features stay bit-identical to the
        // still-image decode of the same pixels); a GIF the codec
        // rejects falls through to decodeImage and then the stub.
        val anim =
          if (m.mediaType == "image" && isGif(m.content))
            decodeGifFrames(m.content, frameStride)
          else None
        val image =
          if (anim.isEmpty && m.mediaType == "image") decodeImage(m.content)
          else None
        val audio = if (m.mediaType == "audio") decodeAudio(m.content) else None
        val video = if (m.mediaType == "video") decodeVideoMeta(m.content) else None
        if (anim.isDefined) {
          val (w0, h0, n, frames) = anim.get
          val resized = frames.map { px =>
            resizeTo match {
              case Some((mw, mh)) => resamplePixels(w0, h0, px, mw, mh)
              case None => (w0, h0, px)
            }
          }
          val (w, h, _) = resized.head
          val perFrame = resized.map { case (_, _, px) => embedder.embedBytes(px) }
          // one sampled frame: its (already unit-norm) embedding verbatim —
          // the re-normalize below would perturb low bits for nothing, and
          // a still GIF must embed bit-identically to the same pixels in
          // any other container
          val pooled =
            if (perFrame.size == 1) perFrame.head
            else {
              val acc = new Array[Float](dim)
              perFrame.foreach { f =>
                var j = 0
                while (j < dim) { acc(j) += f(j); j += 1 }
              }
              var norm = 0.0
              var j = 0
              while (j < dim) { norm += acc(j).toDouble * acc(j); j += 1 }
              val inv = if (norm > 0) (1.0 / math.sqrt(norm)).toFloat else 0f
              j = 0
              while (j < dim) { acc(j) *= inv; j += 1 }
              acc
            }
          MediaFeatures(m.key, m.mediaType, m.content.length.toLong, w, h,
            nFrames = n, decoded = true, pooled)
        } else (image, audio, video) match {
          case (Some((w0, h0, px0)), _, _) =>
            val (w, h, px) = resizeTo match {
              case Some((mw, mh)) => resamplePixels(w0, h0, px0, mw, mh)
              case None => (w0, h0, px0)
            }
            MediaFeatures(m.key, m.mediaType, m.content.length.toLong, w, h,
              nFrames = 1, decoded = true, embedder.embedBytes(px))
          case (_, Some((rate, ch, n, mono)), _) =>
            // resizeTo is a PIXEL box — no audio meaning, ignored here
            // (width/height carry sampleRate/channels, see MediaFeatures)
            MediaFeatures(m.key, m.mediaType, m.content.length.toLong,
              width = rate, height = ch, nFrames = n, decoded = true,
              embedder.embedBytes(mono))
          case (_, _, Some((w0, h0, frames))) =>
            // real CONTAINER metadata (tkhd geometry, stts frame count);
            // pixel decode stays the documented boundary, so features
            // hash the container bytes and decoded stays FALSE — the
            // flag means "features computed over codec output", and a
            // downstream quarantine of undecoded media must still catch
            // these rows even though their dimensions are trustworthy
            val (w, h) = resizeTo match {
              case Some((mw, mh)) => fitBox(w0, h0, mw, mh)
              case None => (w0, h0)
            }
            MediaFeatures(m.key, m.mediaType, m.content.length.toLong, w, h,
              frames, decoded = false, embedder.embedBytes(m.content))
          case _ =>
            val (w0, h0, frames) = decodeStub(m)
            val (w, h) = resizeTo match {
              case Some((mw, mh)) => fitBox(w0, h0, mw, mh)
              case None => (w0, h0)
            }
            MediaFeatures(m.key, m.mediaType, m.content.length.toLong, w, h,
              frames, decoded = false, embedder.embedBytes(m.content))
        }
      }
    }
  }

  /** binaryFile scan → typed media Dataset (type inferred from extension). */
  def fromBinaryFiles(spark: SparkSession, pathGlob: String): Dataset[MediaObject] = {
    import spark.implicits._
    graft.sources.ObjectSources.binaryObjects(spark, pathGlob)
      .select(
        col("path").as("key"),
        when(col("path").rlike("(?i)\\.(png|jpg|jpeg|gif|bmp)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|aiff?|au|mp3)$"), "audio")
          .when(col("path").rlike("(?i)\\.(mp4|m4v|mov|mkv)$"), "video")
          .otherwise("binary").as("mediaType"),
        col("content"))
      .as[MediaObject]
  }

  /** Frame sampling for video stand-ins: every `stride`-th frame index up
    * to `nFrames` — the batch-shape a real sampler produces. */
  def sampleFrameIndexes(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sampled_frames",
      expr(s"filter(sequence(0, nFrames - 1), i -> i % $stride = 0)"))

  /** Metadata-level resize to a target box, preserving aspect ratio — the
    * dimension arithmetic over an already-extracted [[MediaFeatures]]
    * frame (no pixels are carried there). For the real pixel resample,
    * pass `resizeTo` to [[extractFeatures]], which letterboxes the
    * decoded image with `Graphics2D` BEFORE embedding. */
  def resize(ds: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    require(maxW > 0 && maxH > 0)
    ds.mapPartitions { it =>
      it.map { f =>
        // audio rows carry (sampleRate, channels) in (width, height) —
        // a pixel box has no meaning there; pass them through unchanged
        if (f.mediaType == "audio") f
        else {
          val (w, h) = fitBox(f.width, f.height, maxW, maxH)
          f.copy(width = w, height = h)
        }
      }
    }
  }
}
