package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The container has no image/audio codecs, so the decode and resize kernels
  * are clearly-marked DETERMINISTIC STUBS (`decodeStub`, `resizeStub`) — but
  * everything Spark
  * owns is real and tested: the schema (binary payload + flat metadata
  * columns), the per-partition batched iteration shape (`mapPartitions` over
  * an Iterator, exactly where a JNI/FFI codec would sit), the partitioning
  * (payloads hash-spread by id so one executor never holds all the large
  * blobs), and the expression-level metadata/frame ops (byte length, md5
  * content id, deterministic frame sampling via binary substring) which stay
  * in codegen and are DuckDB-oracle-checkable.
  *
  * At 100 TB: payloads dominate storage — read them from parquet binary
  * columns with column pruning (never scan payload bytes for metadata-only
  * queries; the metadata lives in separate columns on purpose), decode via
  * mapPartitions batched kernels, and write features back columnar.
  */
object Multimodal {

  /** Media-ingest fixture writer: one raw `.bin` file per row (UTF-8 payload
    * bytes), written from the executors via foreachPartition — the landing-
    * zone shape `spark.read.format("binaryFile")` ingests. Local-FS scratch
    * only (tests/dev); at cluster scale the directory is an object store and
    * this writer is the upload job.
    */
  def writeBinaryFiles(rows: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    // Executors write via java.nio to a DRIVER-LOCAL path; on a multi-node
    // master the files would land on executor-local disks and the read-back
    // would be silently partial. Fail loudly instead of corrupting.
    require(rows.sparkSession.sparkContext.isLocal,
      "writeBinaryFiles is a local-FS fixture writer; on a cluster the " +
        "landing zone must be shared storage (object store upload job)")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    new java.io.File(dir).mkdirs(): Unit
    rows.select(col(idCol).cast("string").as("__id"), col(textCol).as("__payload"))
      .foreachPartition { (it: Iterator[Row]) =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, r.getString(0) + ".bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
        }
      }
  }

  /** Synthesize a deterministic media table from the documents table: the
    * payload is the UTF-8 text bytes (a stand-in with realistic variable
    * sizes); kind/width/height/sample_rate derive from the doc id.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      ((col("doc_id") % 64 + 1) * lit(16)).cast("int").as("width"),
      ((col("doc_id") % 48 + 1) * lit(16)).cast("int").as("height"),
      (lit(8000) * (col("doc_id") % 3 + 1)).cast("int").as("sample_rate"))

  /** Expression-level metadata extraction — codegen-friendly, no decode:
    * payload byte length, 32-hex content id, aspect ratio, and `frames`
    * evenly-spaced 8-byte "frame samples" hex-encoded (the frame-sampling
    * access pattern without a codec).
    */
  def metaFeatures(media: DataFrame, frames: Int = 4): DataFrame = {
    val n = length(col("payload"))
    val frameCols = (0 until frames).map { f =>
      hex(col("payload").substr((n * f / frames + 1).cast("int"), lit(8)))
        .as(s"frame_$f")
    }
    media.select(
      Seq(col("media_id"), col("kind"), col("width"), col("height"),
        n.as("n_bytes"), md5(col("payload")).as("content_id"),
        (col("width").cast("double") / col("height").cast("double")).as("aspect")
      ) ++ frameCols: _*)
  }

  /** Feature schema produced by the decode kernel. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = true),
    StructField("feat_mean", DoubleType, nullable = false),
    StructField("feat_dim", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB DECODER — deterministic fake standing in for an image/audio codec
    * (none ships in this container). The Spark-side contract is the real
    * deliverable: hash-repartition by media id (spread large payloads), then
    * a per-partition batched kernel over an Iterator — swap the body for a
    * JNI/FFI call and nothing else changes. The fake "features" are `dim`
    * byte-window averages of the payload, normalized to [0,1] — deterministic
    * pure integer-sum / double-division arithmetic, so tests assert exact
    * values and a DuckDB oracle reproduces them bit-for-bit (q68).
    */
  def decodeStub(media: DataFrame, dim: Int = 8, partitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val input = media.select("media_id", "kind", "payload").repartition(n, col("media_id"))
    val rows = input.queryExecution.toRdd.mapPartitions { it =>
      it.map { internal =>
        val mediaId = internal.getLong(0)
        val kind = if (internal.isNullAt(1)) null else internal.getUTF8String(1).toString
        val bytes = internal.getBinary(2)
        val feats = new Array[Double](dim)
        val window = math.max(bytes.length / dim, 1)
        var f = 0
        while (f < dim) {
          var sum = 0L; var cnt = 0
          var i = f * window
          while (i < math.min((f + 1) * window, bytes.length)) {
            sum += (bytes(i) & 0xff); cnt += 1; i += 1
          }
          feats(f) = if (cnt == 0) 0.0 else (sum.toDouble / cnt / 255.0)
          f += 1
        }
        Row(mediaId, kind, feats.sum / dim, dim, feats.toSeq)
      }
    }
    spark.createDataFrame(rows, decodedSchema)
  }

  /** Schema produced by the resize kernel. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes_in", IntegerType, nullable = false),
    StructField("stride", IntegerType, nullable = false),
    StructField("n_bytes_out", IntegerType, nullable = false),
    StructField("out_w", IntegerType, nullable = false),
    StructField("out_h", IntegerType, nullable = false),
    StructField("payload_out", BinaryType, nullable = false)))

  /** STUB RESIZE — the remaining kernel shape of the multimodal quartet
    * (decode / feature-extract / frame-sample / RESIZE). Same contract as
    * [[decodeStub]]: hash-repartition by media id, per-partition batched
    * kernel over an Iterator, swap the body for a real scaler (libvips /
    * ffmpeg scale / audio resampler) via JNI/FFI and nothing else changes.
    * The deterministic fake keeps every k-th payload byte where
    * k = ceil(n / maxBytes) (so the output is <= maxBytes bytes) and scales
    * the width/height metadata by the same k (floored, min 1) — pure
    * integer arithmetic, so the DuckDB oracle reproduces the resized
    * payload bit-for-bit (the synthesized payloads are ASCII, where a
    * varchar stride equals the byte stride).
    */
  def resizeStub(media: DataFrame, maxBytes: Int = 64, partitions: Int = 0): DataFrame = {
    require(maxBytes >= 1, s"maxBytes=$maxBytes must be >= 1")
    val spark = media.sparkSession
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val input = media.select("media_id", "payload", "width", "height")
      .repartition(n, col("media_id"))
    val rows = input.queryExecution.toRdd.mapPartitions { it =>
      it.map { internal =>
        val mediaId = internal.getLong(0)
        val bytes = internal.getBinary(1)
        val w = internal.getInt(2)
        val h = internal.getInt(3)
        val len = bytes.length
        val k = math.max(1, (len + maxBytes - 1) / maxBytes)
        val out = new Array[Byte]((len + k - 1) / k)
        var i = 0
        var j = 0
        while (i < len) { out(j) = bytes(i); j += 1; i += k }
        Row(mediaId, len, k, out.length,
          math.max(1, w / k), math.max(1, h / k), out)
      }
    }
    spark.createDataFrame(rows, resizedSchema)
  }
}
