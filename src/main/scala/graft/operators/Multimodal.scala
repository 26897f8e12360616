package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run feature
  * extraction as a partition-wise batch transform.
  *
  * The actual media decoding is STUBBED (no image/audio libs in this
  * container — see the deterministic fake in [[decodeStub]]); everything
  * Spark-side is real: the (content, meta) schema, the mapPartitions
  * batch shape (the Scala analog of a Pandas-UDF-over-mapInPandas
  * pipeline), and the partitioning contract (payloads stay distributed;
  * nothing is collected to the driver).
  */
object Multimodal {

  /** Metadata carried with every binary payload. */
  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType),      // image | audio | video | text
    StructField("mime", StringType),
    StructField("width", IntegerType),    // -1 when unknown / not decoded
    StructField("height", IntegerType)))

  /** Wrap a string/binary column into the canonical (content: binary,
    * meta: struct) multimodal shape. */
  def withBinary(df: DataFrame, sourceCol: String,
      kind: String = "text", mime: String = "text/plain"): DataFrame =
    df.withColumn("content", col(sourceCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(kind).as("kind"), lit(mime).as("mime"),
        lit(-1).as("width"), lit(-1).as("height")))

  /** Deterministic fake "decode": real decode would use an image/audio
    * codec here (unavailable in this container). The fake derives stable
    * pseudo-features from the bytes so downstream plumbing is testable.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return Array.empty
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-wise feature extraction over the binary column: the Scala
    * analog of mapInPandas — each partition is processed as a batch, the
    * decoder is instantiated once per partition (the expensive step for a
    * real codec), and rows stream through without driver involvement. */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType)),
      StructField("n_bytes", IntegerType)))
    val enc = Encoders.row(schema)
    df.select(col(idCol).cast(LongType).as("id"), col("content"))
      .mapPartitions { rows =>
        // per-partition decoder init would go here (real codec handle)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          Row(r.getLong(0), decodeStub(bytes).toSeq,
            if (bytes == null) 0 else bytes.length)
        }
      }(enc)
  }
}
