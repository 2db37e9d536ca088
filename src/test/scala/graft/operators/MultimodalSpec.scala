package graft.operators

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media record plumbing: decode stub runs partition-parallel") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Tables.documents(s, sf()).limit(50)
    val feats = Multimodal.extractFeatures(
      Multimodal.asMediaRecords(docs, "doc_id", "text")).collect()
    assert(feats.length == 50)
    val byId = feats.map(f => f.id -> f).toMap
    val raw = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    raw.foreach { case (id, text) =>
      val f = byId(id)
      val bytes = text.getBytes("UTF-8")
      assert(f.nBytes == bytes.length)
      assert(f.meanByte ==
        bytes.map(_ & 0xff).sum.toDouble / bytes.length)
      assert(f.frameCount == math.min(bytes.length / 64 + 1, 32))
      assert(f.contentHash.matches("[0-9a-f]{32}"))
    }
  }

  test("resize + frame-sample stages: schema, expansion, partition-parallel") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Tables.documents(s, sf()).limit(40).repartition(4)
    val records = Multimodal.asMediaRecords(docs, "doc_id", "text")
    // resize: payload exactly targetBytes, partitioning preserved
    val resized = Multimodal.resizeAll(records, 128)
    assert(resized.rdd.getNumPartitions == 4)
    resized.collect().foreach(r => assert(r.payload.length == 128))
    // frame sampling: row-expanding, frames reference their record
    val frames = Multimodal.sampleFrames(records, 2).collect()
    assert(frames.length > 40) // expansion happened
    val byId = frames.groupBy(_.id)
    val raw = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byId.foreach { case (id, fs) =>
      val nBytes = raw(id).getBytes("UTF-8").length
      val expected = (0 until math.max(nBytes / 64, 1) by 2).size
      assert(fs.length == expected)
      fs.foreach(f => assert(f.bytes.length <= 64))
    }
  }

  test("columnar metadata path agrees with the typed decode path") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Tables.documents(s, sf()).limit(20)
    val meta = Multimodal.payloadMeta(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val feats = Multimodal.extractFeatures(
      Multimodal.asMediaRecords(docs, "doc_id", "text")).collect()
    feats.foreach { f =>
      assert(meta(f.id) == ((f.nBytes, f.contentHash)))
    }
  }
}
