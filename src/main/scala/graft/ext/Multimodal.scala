package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §7.7): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by batch-shaped
  * per-partition decoders.
  *
  * All three kinds decode REAL container bytes: [[ImageHeader]] parses
  * width/height/format from PNG/JPEG/GIF, [[MediaHeader]] parses the WAV
  * RIFF `fmt ` chunk (sample rate, channels) and the MP4 `moov`→`trak`→
  * `tkhd` box (width, height). Header parsing is the scan-speed metadata
  * path — no pixel/sample decode; a full codec swaps in behind the same
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
      StructField("format", StringType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType))))))

  /** Build a media table from the documents table. Every row carries REAL
    * container bytes with parameters derived from the id — a stored-blob
    * stand-in that real header parsing must decode: images alternate
    * PNG/JPEG, audio is a canonical WAV header, video a minimal ISO-BMFF
    * (ftyp + moov/trak/tkhd).
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
        val bytes = r.getString(1) match {
          case "image" =>
            val w = (id % 640 + 1).toInt
            val h = (id % 480 + 1).toInt
            if (id % 6 == 0) ImageHeader.pngBytes(w, h)
            else ImageHeader.jpegBytes(w, h)
          case "audio" =>
            MediaHeader.wavBytes(8000 + (id % 5).toInt * 8000, (id % 2).toInt + 1)
          case _ =>
            MediaHeader.mp4Bytes((id % 1920).toInt + 16, (id % 1080).toInt + 16)
        }
        Row(id, r.getString(1), bytes)
      }
    }(Encoders.row(schema))
  }

  /** Per-partition batch decode producing the typed metadata struct — the
    * Scala shape of a mapInPandas/Arrow-batch decoder: rows stream through
    * a partition-local decoder without driver involvement or shuffle.
    * Unparseable bytes yield null fields and format "unknown".
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
        val n = if (bytes == null) 0L else bytes.length.toLong
        val unknown = Row(n, null, null, "unknown", null, null)
        val meta = kind match {
          case "image" => ImageHeader.decode(bytes)
            .map(i => Row(n, i.width, i.height, i.format, null, null))
            .getOrElse(unknown)
          case "audio" => MediaHeader.decodeWav(bytes)
            .map(a => Row(n, null, null, a.format, a.sampleRate, a.channels))
            .getOrElse(unknown)
          case "video" => MediaHeader.decodeMp4(bytes)
            .map(v => Row(n, v.width, v.height, v.format, null, null))
            .getOrElse(unknown)
          case _ => unknown
        }
        Row(r.getLong(idIdx), kind, bytes, meta)
      }
    }(Encoders.row(schema))
  }

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
