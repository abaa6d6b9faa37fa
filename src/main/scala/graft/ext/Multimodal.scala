package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §7.7): image/audio/video as opaque
  * `binary` columns with typed metadata, processed by batch-shaped
  * per-partition decoders.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions from the
  * byte stream. Everything around it — the binary column, the metadata
  * struct schema, the mapPartitions batch shape, the partitioning story —
  * is real: swap `fakeDecode` for an actual codec call and nothing else
  * changes.
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

  /** Build a media table from the documents table: text bytes stand in for
    * media payloads (binary column semantics are identical).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("content"))

  /** ===== STUB ===== deterministic fake decode: width/height/format derived
    * from the byte length. A real implementation calls the codec here, per
    * batch, with the same signature.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, String) = {
    val n = bytes.length
    (n % 640, (n * 7) % 480, n % 3 match {
      case 0 => "rgb8"
      case 1 => "pcm16"
      case _ => "h264"
    })
  }

  /** Per-partition batch decode producing the typed metadata struct — the
    * Scala shape of a mapInPandas/Arrow-batch decoder: rows stream through
    * a partition-local decoder without driver involvement or shuffle.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val schema = mediaSchema
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val (w, h, fmt) = fakeDecode(bytes)
        Row(r.getLong(idIdx), r.getString(kindIdx), bytes,
          Row(bytes.length.toLong, w, h, fmt))
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
