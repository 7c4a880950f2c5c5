package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns with typed metadata, processed by per-partition JVM batch
  * functions — the Scala analogue of a Pandas-UDF/`mapInPandas` stage.
  *
  * The decode step is a STUB by design (no image/audio codecs in this
  * container): `extractFeatures` performs real byte-level computation
  * (length, FNV-independent checksum, md5 digest, byte histogram) where
  * a decoder (JPEG → pixels, PCM → frames) would plug in. Everything
  * around it — the binary schema, the typed Dataset, the mapPartitions
  * batch shape, partition-parallel execution — is the real 100 TB
  * plumbing: payloads never hit the driver, one decoder init per
  * partition (the expensive-init amortization that motivates
  * mapPartitions over per-row UDFs).
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  case class MediaItem(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Stub "decoded" features: real byte statistics standing in for
    * decoded-content features. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           checksum: Long, digest: String, hist: Array[Double])

  /** Synthesize the media table from `documents` (deterministic: payload
    * = UTF-8 bytes of the text; type cycles by doc_id). A real deployment
    * reads `binary` columns straight from parquet — same schema. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] =
    mediaTable(Tables(spark, dir, "documents"))

  /** df form: expects (doc_id: Long, text: String). */
  def mediaTable(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaItem]
  }

  /** Per-partition batch "decode" + feature extraction. The partition
    * iterator is the batch boundary (= `mapInPandas` batch): expensive
    * decoder state would be initialized once per partition here. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { iter =>
      // decoder init would go here (once per partition)
      val md = java.security.MessageDigest.getInstance("MD5")
      iter.map { m =>
        var sum = 0L
        val hist = new Array[Double](8)
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xFF
          sum = (sum + b) % 4294967296L
          hist(b >> 5) += 1.0
          i += 1
        }
        md.reset()
        val digest = md.digest(m.payload).map("%02x".format(_)).mkString
        val n = math.max(m.payload.length, 1)
        MediaFeatures(m.doc_id, m.media_type, m.payload.length.toLong, sum,
          digest, hist.map(_ / n))
      }
    }
  }

  /** A "resized" media item: fixed target dimensions + transformed
    * payload. */
  case class ResizedMedia(doc_id: Long, media_type: String,
                          width: Int, height: Int, payload: Array[Byte])

  /** One sampled frame of a media payload. */
  case class MediaFrame(doc_id: Long, frame_idx: Long, payload: Array[Byte])

  /** Resize STUB: a real implementation decodes (JPEG→pixels), scales,
    * re-encodes; the codec being absent here, the payload is
    * deterministically downsampled byte-wise to w·h bytes. The Spark
    * plumbing — typed in/out schema, per-partition batches, payload
    * never at the driver — is the real thing. */
  def resizeStub(items: Dataset[MediaItem], w: Int, h: Int): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    items.mapPartitions { iter =>
      // decoder/scaler init once per partition here
      iter.map { m =>
        val n = w * h
        val out = Array.tabulate(n) { i =>
          if (m.payload.isEmpty) 0.toByte
          else m.payload((i.toLong * m.payload.length / n).toInt)
        }
        ResizedMedia(m.doc_id, m.media_type, w, h, out)
      }
    }
  }

  /** Frame-sampling STUB (one row → many): treats the payload as
    * fixed-size pseudo-frames (`frameBytes` each) and emits every
    * `everyNth` frame — the exact flatMap shape of real video frame
    * extraction, with the ffmpeg call stubbed to a slice. */
  def frameSampleStub(items: Dataset[MediaItem], frameBytes: Int = 256,
                      everyNth: Int = 2): Dataset[MediaFrame] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (bytes, idx) => MediaFrame(m.doc_id, idx.toLong, bytes) }
    }
  }

  /** A media payload embedded into R^dim. */
  case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Embedding-extraction STUB: a real deployment runs an ONNX/JNI
    * vision or audio encoder initialized once per partition; here the
    * "encoder" rolls payload bytes into a position-mixed histogram and
    * L2-normalizes — deterministic, locality-preserving for byte-similar
    * payloads, and shaped exactly like the real stage (typed in/out,
    * per-partition batches, `Array[Float]` column out, payloads never at
    * the driver). Output plugs straight into `Similarity`'s ANN
    * operators. */
  def embedStub(items: Dataset[MediaItem], dim: Int = 64): Dataset[MediaEmbedding] = {
    import items.sparkSession.implicits._
    items.mapPartitions { iter =>
      // encoder/model init once per partition here
      iter.map { m =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xFF
          v((b * 31 + (i % 7)) % dim) += 1.0f
          i += 1
        }
        var s = 0.0
        v.foreach(x => s += x.toDouble * x)
        val n = math.sqrt(s).toFloat
        MediaEmbedding(m.doc_id, if (n == 0f) v else v.map(_ / n))
      }
    }
  }

  /** Multimodal → similarity composition: embed the media table, then
    * exact cosine top-k over the stub embeddings — the end-to-end shape
    * of "find media like these" at corpus scale (swap `bruteForceTopK`
    * for `ivfTopK` when the corpus outgrows brute force). */
  def mediaNeighbors(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Similarity.bruteForceTopK(
      embedStub(mediaTable(spark, dir)).toDF()
        .select(col("doc_id").as("vec_id"), col("embedding")),
      col("vec_id") < 10, k)

  /** q_multimodal_frames: per-document frame-sampling ledger — frame
    * count and sampled-byte mass from `frameSampleStub` (every 2nd
    * 256-byte pseudo-frame). The sampling arithmetic is deterministic,
    * so unlike the codec stub itself this composition IS oracle-checkable
    * (the DuckDB mirror recomputes it from byte lengths). */
  def frameLedger(spark: SparkSession, dir: String): DataFrame =
    frameSampleStub(mediaTable(spark, dir))
      .toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("payload")).cast("long")).as("frame_bytes"))

  /** North-star q_multimodal: driver-checkable projection (the histogram
    * array is covered by ScalaTest; byte length / checksum / digest have
    * an exact DuckDB mirror). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("checksum"), col("digest"))
}
