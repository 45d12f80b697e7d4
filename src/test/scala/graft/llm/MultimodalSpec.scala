package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = catalog.table("documents")
    .limit(50)
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("mediaPipeline: typed meta + decoded struct + feature vector") {
    val out = Multimodal.mediaPipeline(mediaDf, col("payload"),
      lit("image/png"))
    val schema = out.schema
    assert(schema("media_meta").dataType.catalogString ===
      Multimodal.MediaMetaSchema.catalogString)
    val r = out.select(col("media_meta.mime"), col("media_meta.n_bytes"),
      col("decoded.ok"), size(col("features"))).head()
    assert(r.getString(0) === "image/png")
    assert(r.getLong(1) > 0 && r.getBoolean(2) && r.getInt(3) === 8)
  }

  test("batched mapPartitions decode agrees with the columnar stub") {
    val cols = Multimodal.mediaPipeline(mediaDf, col("payload"),
        lit("image/png"))
      .select(col("doc_id"), col("decoded.width"), col("decoded.height"),
        col("decoded.channels"), col("decoded.ok"))
      .collect().map(_.toSeq).toSet
    val batched = Multimodal.decodeImagesBatched(mediaDf, col("payload"))
      .select(col("doc_id"), col("decoded.width"), col("decoded.height"),
        col("decoded.channels"), col("decoded.ok"))
      .collect().map(_.toSeq).toSet
    assert(batched === cols)
    // output schema keeps the input columns + the typed decoded struct
    val sch = Multimodal.decodeImagesBatched(mediaDf, col("payload")).schema
    assert(sch.fieldNames.toSeq === Seq("doc_id", "payload", "decoded"))
    assert(sch("decoded").dataType.catalogString ===
      Multimodal.DecodedSchema.catalogString)
  }

  test("frame sampling splits the payload into non-empty byte ranges") {
    val out = mediaDf.select(
      Multimodal.stubSampleFrames(col("payload"), 4).as("frames"),
      length(col("payload")).as("len"))
    val r = out.filter(col("len") >= 4).head()
    val frames = r.getSeq[Array[Byte]](0)
    assert(frames.length === 4)
    assert(frames.forall(_.nonEmpty))
  }
}
