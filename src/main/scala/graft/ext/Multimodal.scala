package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §7.7): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by batch-shaped
  * per-partition decoders.
  *
  * IMAGE decode is REAL: [[ImageHeader]] parses width/height/format from
  * PNG/JPEG/GIF container bytes (header parse, no pixel decode — the
  * scan-speed metadata path). Audio/video decode remains STUBBED (the JDK
  * carries no audio/video codecs): deterministic fake dimensions from the
  * byte stream, honestly labeled; a real codec call swaps in with the same
  * per-batch signature.
  *
  * Scale notes: media bytes dominate row size, so (1) metadata-only queries
  * must prune the binary column (columnar formats make this free — verify
  * ReadSchema excludes `content`); (2) decode is per-partition batch work
  * with no shuffle; (3) store media in size-bucketed partitions so decode
  * tasks are balanced (a 4 KB icon and a 40 MB video in one task skews).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))))))

  /** Build a media table from the documents table. Image rows carry REAL
    * container bytes (alternating PNG/JPEG with dimensions derived from the
    * id — a stored-blob stand-in that real header parsing must decode);
    * audio/video rows use text bytes as opaque payloads.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("content"))
    val schema = base.schema
    base.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (r.getString(1) == "image") {
          val w = (id % 640 + 1).toInt
          val h = (id % 480 + 1).toInt
          val bytes =
            if (id % 6 == 0) ImageHeader.pngBytes(w, h)
            else ImageHeader.jpegBytes(w, h)
          Row(id, "image", bytes)
        } else r
      }
    }(Encoders.row(schema))
  }

  /** ===== STUB (audio/video only) ===== deterministic fake decode for the
    * codec-less kinds: dimensions derived from the byte length. A real
    * implementation calls the codec here, per batch, same signature.
    */
  private def fakeDecode(bytes: Array[Byte], kind: String): (Int, Int, String) = {
    val n = bytes.length
    (n % 640, (n * 7) % 480, if (kind == "audio") "pcm16" else "h264")
  }

  /** Per-partition batch decode producing the typed metadata struct — the
    * Scala shape of a mapInPandas/Arrow-batch decoder: rows stream through
    * a partition-local decoder without driver involvement or shuffle.
    * Images go through the real header parser; unparseable image bytes
    * yield null dimensions and format "unknown".
    */
  def decode(media: DataFrame): DataFrame = {
    val schema = mediaSchema
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val kind = r.getString(kindIdx)
        val meta = kind match {
          case "image" => ImageHeader.decode(bytes) match {
            case Some(info) => Row(bytes.length.toLong, info.width, info.height, info.format)
            case None => Row(bytes.length.toLong, null, null, "unknown")
          }
          case k =>
            val (w, h, fmt) = fakeDecode(bytes, k)
            Row(bytes.length.toLong, w, h, fmt)
        }
        Row(r.getLong(idIdx), kind, bytes, meta)
      }
    }(Encoders.row(schema))
  }

  /** Back-compat alias for the round-1 name. */
  def decodeStub(media: DataFrame): DataFrame = decode(media)

  /** Metadata-only projection — must NOT read the binary column at scan
    * time (check ReadSchema in the plan).
    */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("content")).cast("bigint").as("byte_len"))

  /** Frame-sampling stub: pick deterministic frame offsets (every `stride`
    * bytes stands in for every Nth frame) — the partition/batch shape of a
    * real frame sampler.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
      transform(sequence(lit(0), length(col("content")).cast("int") - 1, lit(stride)),
        i => i).as("frame_offsets"))
}
