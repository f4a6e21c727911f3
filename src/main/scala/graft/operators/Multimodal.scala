package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with a typed metadata struct beside them.
  *
  * The Spark-side design is the real deliverable here — schema, batch
  * shape, and partitioning are what a 100 TB media pipeline lives or dies
  * by:
  *  - payloads stay in ONE binary column, never exploded into rows, so
  *    Parquet keeps them contiguous and the scan can prune them when a
  *    query touches only metadata (column pruning skips megabytes/row);
  *  - decode/feature-extract runs per-PARTITION over an iterator
  *    (`mapPartitions`), the JVM shape that amortizes per-batch codec
  *    setup exactly like `mapInPandas` batches do in Python;
  *  - repartitioning before decode is byte-budgeted, not row-budgeted
  *    (`targetPartitionBytes`), since row counts mean nothing when rows
  *    are 10 KB–100 MB.
  *
  * Two codec paths exist: a STUB (`decodeStub` — deterministic fake
  * dimensions; the seam a heavyweight codec/model plugs into at
  * `decodePartition`), and a REAL image path (`renderPng`/`decodeImage`/
  * `resizeImage`) built on `javax.imageio`, which ships with the JDK —
  * actual PNG encode/decode and raster resize, no external libraries.
  */
object Multimodal {

  /** Typed metadata carried beside a binary payload. */
  case class MediaMeta(byteLen: Long, mime: String, width: Int, height: Int)

  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Binary payload column for a text value (utf-8 bytes) — the column
    * -level seam that lets metadata queries project payload-derived values
    * straight off the source scan, with no join back to the media table.
    */
  def payloadOf(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    encode(textCol, "UTF-8")

  /** Wrap a text corpus as fake media rows: payload = utf-8 bytes. Lets
    * the whole pipeline be exercised on the synthetic corpus.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), payloadOf(col(textCol)).as("payload"))

  /** STUB decoder: deterministic fake dimensions from the payload bytes.
    * A real implementation would hand `bytes` to a codec; everything
    * around this call (batching, schema, partitioning) is production
    * shape.
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    // Cheap deterministic pseudo-dimensions: fold the first/last bytes.
    val h = bytes.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    MediaMeta(len, "application/octet-stream",
      (math.abs(h) % 1920).toInt + 1, (math.abs(h / 1920) % 1080).toInt + 1)
  }

  /** Per-partition decode: iterator-in/iterator-out, so a real codec can
    * allocate once per partition and stream rows through (the JVM
    * equivalent of a `mapInPandas` batch loop).
    */
  def decodePartition(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, bytes) => MediaRow(id, bytes, decodeStub(bytes)) }

  /** Full decode pipeline: byte-budgeted repartition → per-partition
    * decode → typed Dataset with the metadata struct materialized.
    */
  def decode(spark: SparkSession, media: DataFrame,
             targetPartitionBytes: Long = 128L * 1024 * 1024): Dataset[MediaRow] = {
    import spark.implicits._
    val stats = media.agg(sum(length(col("payload"))).as("bytes")).head()
    val totalBytes = Option(stats.getAs[Long]("bytes")).getOrElse(0L)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .repartition(parts)
      .mapPartitions(decodePartition)
  }

  /** Per-media feature vector (an embedding extractor's output shape). */
  case class MediaFeature(id: Long, feature: Array[Float])

  /** STUB feature extraction: an 8-bin byte-value histogram, L1-normalized
    * — deterministic and cheap, with exactly the signature a real
    * embedding model (CLIP-style) plugs into. Iterator-in/iterator-out so
    * a real model loads once per partition, never per row.
    */
  def featureExtractPartition(
      rows: Iterator[(Long, Array[Byte])]): Iterator[MediaFeature] =
    rows.map { case (id, bytes) =>
      val hist = new Array[Float](8)
      bytes.foreach(b => hist((b & 0xff) >> 5) += 1f)
      val n = math.max(1, bytes.length).toFloat
      MediaFeature(id, hist.map(_ / n))
    }

  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(featureExtractPartition)
  }

  /** STUB resize: keep every `factor`-th payload byte (a decimation —
    * the real implementation hands the payload to a codec's scaler).
    * Payload-in/payload-out, so resized media flows through the same
    * binary-column plumbing as the original.
    */
  def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] =
    bytes.grouped(factor).map(_.head).toArray

  def resize(spark: SparkSession, media: DataFrame, factor: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = resizeStub(bytes, factor)
        MediaRow(id, out, decodeStub(out))
      })
  }

  // ---- REAL image codec path (javax.imageio — ships with the JDK) ----

  /** Render a deterministic RGB image (LCG pixels from `seed`) and
    * PNG-encode it. The synthetic payload generator for exercising the
    * real codec path without external image libraries.
    */
  def renderPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((s >>> 24) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: hand the payload to ImageIO, read true dimensions. */
  def decodeImage(bytes: Array[Byte]): MediaMeta = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    MediaMeta(bytes.length.toLong, "image/png", img.getWidth, img.getHeight)
  }

  /** REAL resize: decode, scale through Graphics2D (bilinear), re-encode
    * PNG — payload-in/payload-out like [[resizeStub]], but an actual
    * raster operation.
    */
  def resizeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val dst = new java.awt.image.BufferedImage(targetW, targetH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** Per-doc decoded/resized dimensions from the real codec round-trip. */
  case class ImageRoundTrip(doc_id: Long, w: Int, h: Int, rw: Int, rh: Int)

  /** Real-codec round-trip over ids: render a (seeded, id-derived) PNG,
    * decode it, halve it through the raster scaler, decode again. The
    * emitted dimensions must equal the id-derived formula — a contract an
    * oracle can assert without replaying the codec. mapPartitions keeps
    * the iterator-in/iterator-out batch shape of every codec stage.
    */
  def pngRoundTrip(spark: SparkSession, df: DataFrame,
                   idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + id % 8).toInt
        val png = renderPng(w, h, seed = id)
        val m = decodeImage(png)
        val half = resizeImage(png,
          math.max(1, m.width / 2), math.max(1, m.height / 2))
        val m2 = decodeImage(half)
        ImageRoundTrip(id, m.width, m.height, m2.width, m2.height)
      })
      .toDF()
  }

  /** Per-(doc, format) decoded dimensions across the JDK's standard
    * still-image writers.
    */
  case class FormatProbe(doc_id: Long, fmt: String, w: Int, h: Int)

  /** Codec format matrix: the same id-derived raster encoded as PNG, BMP,
    * and GIF, each decoded back — one row per (doc, format). Exercises
    * ImageIO's format dispatch end-to-end; dimensions must survive every
    * container.
    */
  def formatMatrix(spark: SparkSession, df: DataFrame,
                   idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .flatMap { id =>
        val w = (4 + id % 8).toInt
        val h = (4 + id % 4).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var s = id
        for (y <- 0 until h; x <- 0 until w) {
          s = s * 6364136223846793005L + 1442695040888963407L
          img.setRGB(x, y, ((s >>> 24) & 0xffffff).toInt)
        }
        Seq("png", "bmp", "gif").map { fmt =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          FormatProbe(id, fmt, back.getWidth, back.getHeight)
        }
      }
      .toDF()
  }

  case class ImageHash(doc_id: Long, ahash: String)

  /** 8×8 average hash of a decoded raster, as a 64-char bit string: cell
    * c (row-major over the 8×8 grid, pixel (x,y) → cell
    * ((y·8)/h)·8 + (x·8)/w) is '1' iff the cell's mean gray STRICTLY
    * exceeds the image mean. The compare cross-multiplies integer sums
    * (cellSum·totalCnt > totalSum·cellCnt) so no division ever rounds —
    * the hash is exact integer arithmetic end-to-end.
    */
  def aHash(img: java.awt.image.BufferedImage): String = {
    val (w, h) = (img.getWidth, img.getHeight)
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y) & 0xffffff
        val gray = (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)) / 3
        val cell = ((y * 8) / h) * 8 + (x * 8) / w
        cellSum(cell) += gray; cellCnt(cell) += 1; totalSum += gray
        x += 1
      }
      y += 1
    }
    val totalCnt = w.toLong * h
    (0 until 64).map { c =>
      if (cellSum(c) * totalCnt > totalSum * cellCnt(c)) '1' else '0'
    }.mkString
  }

  /** Perceptual hashes over the REAL codec path: render the id-derived
    * raster, PNG-encode, DECODE THE BYTES BACK, and hash the decoded
    * pixels. The oracle reconstructs the same pixels arithmetically from
    * the LCG's closed form (A^n·s0 + B_n mod 2^64, literals generated
    * from the same constants) without touching a codec — a green row
    * therefore proves the ImageIO encode→decode round-trip is
    * BIT-EXACT, not just dimension-preserving. The hash is the standard
    * near-dup key for image dedup (Hamming-banded, like SimHash).
    */
  def imageHashes(spark: SparkSession, df: DataFrame,
                  idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + id % 8).toInt
        val png = renderPng(w, h, seed = id)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        ImageHash(id, aHash(img))
      })
      .toDF()
  }

  // ---- REAL audio codec path (javax.sound.sampled — JDK built-in) ----

  /** Render deterministic 16-bit mono PCM (LCG samples) and WAV-encode. */
  def renderWav(nFrames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var s = seed
    var i = 0
    while (i < nFrames) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = (s >>> 48).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  case class AudioMeta(byteLen: Long, sampleRate: Int, channels: Int,
                       nFrames: Long)

  /** REAL decode: parse the WAV container, read true format + length. */
  def decodeWav(bytes: Array[Byte]): AudioMeta = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    AudioMeta(bytes.length.toLong, ais.getFormat.getSampleRate.toInt,
      ais.getFormat.getChannels, ais.getFrameLength)
  }

  /** REAL downsample: decode the PCM frames, keep every `factor`-th one,
    * re-encode at the divided rate — an actual sample-domain operation,
    * not byte decimation.
    */
  def downsampleWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val pcm = ais.readAllBytes()
    val frameSize = fmt.getFrameSize
    val kept = pcm.grouped(frameSize).zipWithIndex
      .collect { case (f, i) if i % factor == 0 => f }
      .flatten.toArray
    val outFrames = kept.length / frameSize
    val outFmt = new javax.sound.sampled.AudioFormat(
      fmt.getSampleRate / factor, fmt.getSampleSizeInBits,
      fmt.getChannels, true, fmt.isBigEndian)
    val out = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(kept), outFmt, outFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(out,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-doc decoded/downsampled audio stats from the real codec. */
  case class AudioRoundTrip(doc_id: Long, n_frames: Long, sr: Int,
                            dn_frames: Long, dn_sr: Int)

  /** Real-audio round-trip over ids: render an id-derived WAV, decode,
    * downsample 2×, decode again — dimensions must equal the id-derived
    * formula (the oracle's contract).
    */
  def wavRoundTrip(spark: SparkSession, df: DataFrame,
                   idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (64 + id % 64).toInt
        val wav = renderWav(n, 8000, seed = id)
        val m = decodeWav(wav)
        val down = downsampleWav(wav, 2)
        val m2 = decodeWav(down)
        AudioRoundTrip(id, m.nFrames, m.sampleRate, m2.nFrames,
          m2.sampleRate)
      })
      .toDF()
  }

  /** Per-doc audio features computed from REAL decoded PCM samples. */
  case class AudioFeatures(doc_id: Long, n_frames: Long, sum_abs: Long,
                           energy: Long, peak: Long, zero_cross: Long)

  /** Audio feature extraction over the REAL codec path: render the
    * id-derived WAV, hand the BYTES to `javax.sound.sampled`, decode the
    * PCM back out, and aggregate the decoded 16-bit samples — sum of
    * absolute amplitude, integer energy (Σ v²), peak amplitude, and
    * zero-crossing count (the classic silence/voicing features).
    *
    * Everything is integer-exact: samples are signed 16-bit, so Σ|v| and
    * Σv² fit comfortably in longs at any realistic clip length. The
    * oracle reconstructs the same samples arithmetically from the LCG
    * closed form — a green row therefore proves the WAV encode→decode
    * round-trip SAMPLE-EXACT (mm_wav_roundtrip only proved the container
    * geometry). Per-row mapPartitions work, embarrassingly parallel; the
    * per-partition iterator shape is where a native codec/model would
    * amortize its setup at 100 TB.
    */
  def audioFeatures(spark: SparkSession, df: DataFrame,
                    idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (64 + id % 64).toInt
        val wav = renderWav(n, 8000, seed = id)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        val pcm = ais.readAllBytes()
        var i = 0
        var sumAbs = 0L; var energy = 0L; var peak = 0L; var zc = 0L
        var prevNeg = false
        val frames = pcm.length / 2
        while (i < frames) {
          // little-endian signed 16-bit mono
          val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toLong
          val a = math.abs(v)
          sumAbs += a; energy += v * v; if (a > peak) peak = a
          val neg = v < 0
          if (i > 0 && neg != prevNeg) zc += 1
          prevNeg = neg
          i += 1
        }
        AudioFeatures(id, frames.toLong, sumAbs, energy, peak, zc)
      })
      .toDF()
  }

  /** Id-derived perceptual hashes with PLANTED duplicates: the raster is
    * rendered from `id % period` rather than `id`, so every id congruent
    * mod `period` carries a bit-identical image — the ground truth an
    * image-dedup run must recover. Same real codec path as
    * [[imageHashes]] (render → PNG encode → decode bytes → hash decoded
    * pixels).
    */
  def imageHashesPlanted(spark: SparkSession, df: DataFrame, idCol: String,
                         period: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val key = id % period
        val w = (8 + key % 16).toInt
        val h = (8 + key % 8).toInt
        val png = renderPng(w, h, seed = key)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        ImageHash(id, aHash(img))
      })
      .toDF()
  }

  /** Image near-duplicate pairs: banded Hamming blocking over the 64-bit
    * perceptual hash — the SimHash pigeonhole recipe applied to IMAGES.
    * The hash splits into `maxHamming + 1` blocks; any pair within
    * `maxHamming` must agree exactly on at least one block, so candidates
    * come from per-block equi-joins (Σ|bucket|², never N²) and the native
    * `hamming_dist` byte loop verifies each candidate. The oracle replays
    * ALL pairs from the LCG closed form, proving the blocking lossless.
    */
  def imageNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                        period: Int, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      s"maxHamming must be in [0, 16), got $maxHamming")
    graft.functions.NativeFunctions.register(spark)
    // 2 sides × nBlocks reads of the hash table — materialize once.
    val t = imageHashesPlanted(spark, df, idCol, period).localCheckpoint()
    val nBlocks = maxHamming + 1
    val bounds = (0 to nBlocks).map(i => 1 + i * 64 / nBlocks)
    val perBlock = (0 until nBlocks).map { b =>
      val (from, until) = (bounds(b), bounds(b + 1))
      val block = substring(col("ahash"), from, until - from)
      val side = t.select(col("doc_id"), col("ahash"), block.as("blk"))
      side.as("a").join(side.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.ahash").as("ha"), col("b.ahash").as("hb"))
    }
    val hamming =
      graft.functions.NativeFunctions.hammingDist(col("ha"), col("hb"))
    perBlock.reduce(_ unionByName _)
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming)
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** One sampled frame of a media payload. */
  case class MediaFrame(id: Long, frameIdx: Int, frame: Array[Byte])

  /** Frame sampling: treat the payload as consecutive `frameBytes` chunks
    * ("frames") and emit every `stride`-th one as its OWN row — the
    * generator (flatMap/explode) shape of video frame extraction, where
    * one input row fans out to many. Rows stay bounded by frame size, so
    * downstream per-frame work repartitions freely.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 => MediaFrame(id, i, frame)
        }
      }
  }
}
