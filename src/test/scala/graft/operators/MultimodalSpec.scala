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
