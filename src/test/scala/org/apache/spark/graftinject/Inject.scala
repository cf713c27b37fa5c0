package org.apache.spark.graftinject

import org.apache.spark.shuffle.FetchFailedException

/** Test-only escape hatch: FetchFailedException is private[spark], so the
  * fault-injection spec reaches it through this org.apache.spark-namespace
  * shim — the same pattern the reference's Spark integration uses for its
  * shuffle classes (client-spark lives under org.apache.spark.shuffle.celeborn).
  */
/** Test-only reach into Spark's private[spark] shuffle compression codecs
  * (org.apache.spark.io.CompressionCodec) — the transport codecs behind
  * spark.shuffle.compress / spark.shuffle.spill.compress, which are
  * context-static and therefore proven at unit level in CodecSpec. */
object ShuffleCodecs {
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

  def roundTrip(name: String, data: Array[Byte]): Array[Byte] = {
    val codec = org.apache.spark.io.CompressionCodec.createCodec(
      new org.apache.spark.SparkConf(false), name)
    val bos = new ByteArrayOutputStream()
    val os = codec.compressedOutputStream(bos)
    os.write(data); os.close()
    val is = codec.compressedInputStream(new ByteArrayInputStream(bos.toByteArray))
    try is.readAllBytes() finally is.close()
  }

  def compress(name: String, data: Array[Byte]): Array[Byte] = {
    val codec = org.apache.spark.io.CompressionCodec.createCodec(
      new org.apache.spark.SparkConf(false), name)
    val bos = new ByteArrayOutputStream()
    val os = codec.compressedOutputStream(bos)
    os.write(data); os.close()
    bos.toByteArray
  }

  def decompress(name: String, data: Array[Byte]): Array[Byte] = {
    val codec = org.apache.spark.io.CompressionCodec.createCodec(
      new org.apache.spark.SparkConf(false), name)
    val is = codec.compressedInputStream(new ByteArrayInputStream(data))
    try is.readAllBytes() finally is.close()
  }
}

object Inject {
  /** Throw a fetch failure for a REAL shuffle id (a made-up id crashes the
    * DAGScheduler's event loop: shuffleIdToMapStage lookup fails). A null
    * block-manager address is the "unknown location" form — the scheduler
    * resubmits the map stage without unregistering outputs. */
  def fetchFailed(shuffleId: Int, reduceId: Int, msg: String): Nothing =
    throw new FetchFailedException(null, shuffleId, 0L, 0, reduceId, msg, null)
}
