package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSuite extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma"), (2L, "delta"), (3L, ""), (4L, "epsilon zeta"),
    (5L, "eta theta iota kappa"), (6L, "lambda"), (7L, "mu nu"), (8L, "xi")
  ).toDF("doc_id", "text")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("packMedia carries payload + typed metadata") {
    val m = docs.select(Multimodal.packMedia(col("payload"), "text",
      "text/plain").as("media"))
    val r = m.select(col("media.meta.kind"), col("media.meta.n_bytes"),
      col("media.meta.checksum")).head()
    assert(r.getString(0) === "text")
    assert(r.getLong(1) === "alpha beta gamma".getBytes.length.toLong)
    assert(r.getString(2).length === 32)
  }

  test("batched decode: every row gets a feature vector of the right dim") {
    val out = Multimodal.decodePartitions(docs, "payload",
      new Multimodal.DeterministicFakeDecoder(4), batchSize = 3)
    val rows = out.select(col("doc_id"), size(col("features")))
      .as[(Long, Int)].collect().toMap
    assert(rows.size === 8)
    assert(rows.values.forall(_ === 4))
  }

  test("decode is deterministic across batch sizes and partitionings") {
    def run(parts: Int, batch: Int) =
      Multimodal.decodePartitions(docs.repartition(parts), "payload",
          new Multimodal.DeterministicFakeDecoder(4), batchSize = batch)
        .select(col("doc_id"), col("features"))
        .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(run(1, 64) === run(4, 2))
  }

  test("real codec path is an explicit stub") {
    intercept[NotImplementedError] {
      new Multimodal.RealCodecDecoder(4).decodeBatch(Array(Array[Byte](1)))
    }
  }

  test("frame-offset sampling: every k-th offset, capped") {
    val r = spark.range(1).select(Multimodal.sampleFrameOffsets(
      lit(100L), everyK = 10, maxFrames = 5).as("o")).as[Seq[Long]].head()
    assert(r === Seq(0L, 10L, 20L, 30L, 40L))
  }
}
