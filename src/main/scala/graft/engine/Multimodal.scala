package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for the interleaved-doc
  * table: media rides as opaque `binary` payloads + typed metadata, and
  * decode/feature steps run as typed batch transforms over
  * `Dataset[MediaBatch]` rows (the Scala analog of `mapInPandas` batches).
  *
  * The actual codec decode is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the payload bytes, so the Spark-side plumbing — schema, batch
  * shape, partitioning, join-back — is real and tested while the codec is
  * swappable. Reference analog: GDAL treats raster payloads as opaque
  * blocks behind a driver boundary (gcore/gdal_rasterband.h:247); the
  * driver is the swappable codec.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_ref: String, kind: String,
                      payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_ref: String, kind: String,
                           n_bytes: Int, width: Int, height: Int,
                           features: Array[Float])

  /** Deterministic fake decode: "dimensions" from a rolling hash of the
    * payload, feature vector = normalized byte histogram (16 bins). A real
    * deployment swaps this for an actual codec; everything downstream
    * (schema, partitioning, joins) is unchanged. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    var h = 1125899906842597L
    var i = 0
    while (i < r.payload.length) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
    val w = 16 + ((h & 0x7fffffff) % 1024).toInt
    val hgt = 16 + (((h >>> 32) & 0x7fffffff) % 1024).toInt
    val bins = new Array[Float](16)
    i = 0
    while (i < r.payload.length) { bins((r.payload(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(1, r.payload.length).toFloat
    var j = 0
    while (j < 16) { bins(j) /= n; j += 1 }
    MediaFeatures(r.doc_id, r.media_ref, r.kind, r.payload.length, w, hgt, bins)
  }

  /** media table (doc_id, media_ref, kind, payload:binary) → features.
    * Runs as a typed map — one narrow stage, codegen-friendly schema on
    * both sides, no driver collect. Partitioning of the input is
    * preserved (repartition upstream by doc_id for joins back to docs). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.map(decodeStub)
  }

  /** Batch-shaped variant: mapPartitions so a real codec can amortize
    * per-batch setup (model load, JNI init) across rows — the Scala
    * equivalent of a Pandas-UDF batch. */
  def extractFeaturesBatched(media: Dataset[MediaRow], batchSetup: () => Unit = () => ())
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      batchSetup()
      rows.map(decodeStub)
    }
  }
}
