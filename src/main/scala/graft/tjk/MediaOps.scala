package graft.tjk

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing — schema, partitioning, batched
  * per-partition processing shape (the Scala analogue of `mapInPandas`) — is
  * real and tested; the actual codec call is STUBBED (no image/audio libs in
  * this container) behind [[MediaOps.decodeStub]], a deterministic fake that
  * consumes the same bytes a real decoder would. Swapping in a real decoder
  * changes ONE function, not the pipeline.
  */
object MediaOps {

  /** Typed metadata carried alongside the blob. */
  case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)
  case class MediaRow(doc_id: Long, blob: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, header_hex: String,
      mean_byte: Double, frame_hashes: Seq[Long])

  /** Synthesize a deterministic media table from documents: the UTF-8 bytes
    * of `text` stand in for the encoded payload; metadata derives from a
    * content hash. Purely for plumbing tests — production reads real blobs.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      struct(
        lit("fake/rgb8").as("format"),
        (pmod(xxhash64(col("text")), lit(480L)) + 32L).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(480L)) + 32L).cast("int").as("height"),
        (pmod(xxhash64(col("text"), lit(2)), lit(8L)) + 1L).cast("int").as("n_frames"))
        .as("meta"))

  /** STUB — stands in for the real image/audio decode (??? in spirit: the
    * container has no codec libs). Deterministic: header = first 4 bytes hex,
    * "pixel" statistics = byte statistics of the payload.
    */
  private def decodeStub(blob: Array[Byte]): (String, Double) = {
    val header = blob.take(4).map(b => f"${b & 0xff}%02x").mkString
    val mean = if (blob.isEmpty) 0.0 else blob.map(b => (b & 0xff).toDouble).sum / blob.length
    (header, mean)
  }

  /** Deterministic frame sampling: split the payload into n_frames equal
    * byte ranges and fingerprint each — the shape of a video frame-sampler.
    */
  private def sampleFrames(blob: Array[Byte], nFrames: Int): Seq[Long] = {
    if (blob.isEmpty || nFrames <= 0) Seq.empty
    else (0 until nFrames).map { f =>
      val start = (blob.length.toLong * f / nFrames).toInt
      val end = (blob.length.toLong * (f + 1) / nFrames).toInt
      var h = 1125899906842597L // deterministic FNV-ish rolling fold
      var i = start
      while (i < end) { h = h * 31 + (blob(i) & 0xff); i += 1 }
      h
    }
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * `mapInPandas` batch UDF: rows are processed in fixed-size batches per
    * partition (batch shape matters for real decoders that amortize codec
    * init), schema in/out is declared via Encoders.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val ds = media.as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real pipeline: decoder init once per batch here
        batch.iterator.map { r =>
          val (header, mean) = decodeStub(r.blob)
          MediaFeatures(r.doc_id, r.blob.length.toLong, header,
            mean, sampleFrames(r.blob, r.meta.n_frames))
        }
      }
    }(Encoders.product[MediaFeatures])
  }
}
