package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, batch-shaped decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The actual codec step is STUBBED (image/audio libraries are not in
  * this environment): [[FakeCodec]] is a deterministic stand-in that
  * derives pixels/samples from payload bytes. Everything around it —
  * schema, batch iteration shape (`mapPartitions` over row batches, the
  * JVM analog of `mapInPandas`), partitioning, metadata propagation —
  * is real and is what matters at 100 TB: decode runs once per
  * partition batch, not per row, and payloads never pass through the
  * driver.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to a text column — the
    * fixture stand-in for real media bytes. */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        length(encode(col(textCol), "UTF-8")).as("n_bytes"),
        sha2(encode(col(textCol), "UTF-8"), 256).as("sha256"),
        lit("application/octet-stream").as("mime")))

  /** Pure-column metadata over a binary payload (no decode). */
  def payloadMeta(payload: Column): Column = struct(
    length(payload).as("n_bytes"),
    sha2(payload, 256).as("sha256"))

  /** "Frame sample": every `stride`-th byte of the payload — the shape
    * of video frame-sampling (indexed subranges of the binary), pure
    * Catalyst. */
  def sampleBytes(payload: Column, stride: Int, maxFrames: Int): Column =
    transform(
      sequence(lit(1), least(floor(length(payload) / stride).cast("int"), lit(maxFrames))),
      i => substring(payload, (i - 1) * stride + 1, lit(1)))

  case class MediaRow(id: Long, payload: Array[Byte])
  case class MediaFeatures(id: Long, width: Int, height: Int,
                           features: Array[Float])

  /** Real pure-JVM PNG header decode — no codec library needed: the
    * PNG spec fixes the 8-byte signature, then the IHDR chunk (4-byte
    * length + "IHDR" type at offsets 8..15) with width and height as
    * big-endian u32 at offsets 16 and 20. */
  object PngHeader {
    private val Signature: Array[Byte] =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    /** (width, height) if the payload starts with a valid PNG
      * signature + IHDR chunk header; None otherwise. */
    def dims(payload: Array[Byte]): Option[(Int, Int)] =
      if (payload.length >= 24 &&
          payload.view.slice(0, 8).sameElements(Signature) &&
          payload.view.slice(12, 16)
            .sameElements("IHDR".getBytes("US-ASCII"))) {
        val bb = java.nio.ByteBuffer.wrap(payload, 16, 8)
        Some((bb.getInt, bb.getInt))
      } else None

    /** Minimal PNG signature + IHDR prefix for the given dimensions
      * (spec fixtures plant these payloads). */
    def prefix(width: Int, height: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put(Signature).putInt(13).put("IHDR".getBytes("US-ASCII"))
        .putInt(width).putInt(height)
      bb.array()
    }
  }

  /** Codec with one REAL format path (PNG dimensions via [[PngHeader]])
    * and a deterministic fake for everything else — pixel decode and
    * feature extraction stay stubbed because this environment has no
    * image libraries; a real deployment swaps those for JNI/javacpp
    * bindings without touching the call sites. */
  object FakeCodec {
    /** Decode a payload into (width, height, feature vector): true
      * header dimensions for PNG payloads, fake-but-deterministic
      * otherwise. */
    def decode(payload: Array[Byte], dim: Int = 8): (Int, Int, Array[Float]) = {
      val (w, h) = PngHeader.dims(payload).getOrElse((
        16 + (if (payload.isEmpty) 0 else math.abs(payload(0).toInt) % 64),
        16 + (if (payload.length < 2) 0 else math.abs(payload(1).toInt) % 64)))
      val feats = Array.tabulate(dim) { i =>
        if (payload.isEmpty) 0f
        else payload(i % payload.length).toFloat / 128f
      }
      (w, h, feats)
    }

    /** "Resize": deterministic payload truncation/padding to n bytes. */
    def resize(payload: Array[Byte], n: Int): Array[Byte] =
      java.util.Arrays.copyOf(payload, n)
  }

  /** Batch decode: mapPartitions over typed rows — the decode runs
    * inside the executor, batched per partition, mirroring the
    * `mapInPandas` batch shape. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 8)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition codec init would go here (one per batch, not per row)
      rows.map { r =>
        val (w, h, f) = FakeCodec.decode(r.payload, dim)
        MediaFeatures(r.id, w, h, f)
      }
    }
  }
}
