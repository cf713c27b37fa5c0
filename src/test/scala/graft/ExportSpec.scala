package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Export

/** Sharded export manifest (q76): the manifest must be derived from the
  * re-read files, stay order-independent, and expose sink corruption. */
class ExportSpec extends AnyFunSuite {
  import SparkTestSession._

  test("manifest matches the planned rows and the shard layout is real") {
    val out = java.nio.file.Files.createTempDirectory("graft_exportspec").toString
    val docs = Tables.t(spark, sf, "documents")
    val manifest = Export.exportWithManifest(docs, out, nShards = 4).collect()

    // shard directories exist on disk (partitionBy layout, q44 contract)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length === manifest.length,
      s"manifest rows ${manifest.length} vs shard dirs ${dirs.toSeq}")

    // every kept row is in exactly one shard; totals add up
    val kept = docs.where(size(split(col("text"), " ")) >= 20)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    assert(manifest.map(_.getAs[Long]("n_rows")).sum === kept.count())

    // checksum is order-independent: recompute from the source rows
    // (not the written files) and compare per shard
    val expect = kept
      .withColumn("shard", col("doc_id") % 4)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
        .cast("long").as("checksum"))
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("checksum")).toMap
    manifest.foreach { r =>
      assert(r.getAs[Long]("checksum") === expect(r.getAs[Long]("shard")),
        s"checksum mismatch on shard ${r.getAs[Long]("shard")}")
    }
  }

  test("a corrupted sink cannot produce a clean manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_exportspec2").toString
    val docs = Tables.t(spark, sf, "documents")
    val manifest = Export.exportWithManifest(docs, out, nShards = 4)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("checksum")).toMap
    // simulate data loss: drop one shard directory, re-derive the manifest
    val victim = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).head
    victim.listFiles().foreach(_.delete()); victim.delete()
    val rederived = spark.read.parquet(out)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
        .cast("long").as("checksum"))
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("checksum")).toMap
    assert(rederived.size === manifest.size - 1,
      "lost shard must be visible in the re-derived manifest")
    rederived.foreach { case (s, c) => assert(manifest(s) === c) }
  }
}
