package graft.multimodal

import graft.SparkSpec
import graft.model.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromText(Tables.documents(spark, sfDir), "doc_id", "text")

  test("media table carries bytes with content-addressed metadata") {
    val row = media.orderBy("media_id").head()
    assert(row.getAs[Array[Byte]]("content").nonEmpty)
    assert(row.getAs[Long]("n_bytes") == row.getAs[Array[Byte]]("content").length)
    assert(row.getAs[String]("sha256").matches("[0-9a-f]{64}"))
    assert(media.schema.fieldNames.toSet == Multimodal.mediaSchema.fieldNames.toSet)
  }

  test("batched feature extraction is deterministic with fixed shape") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(m => m.media_id -> m).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 16).collect()
      .map(m => m.media_id -> m).toMap
    assert(f1.size == media.count())
    f1.values.foreach { m =>
      assert(m.features.length == 16)
      assert(m.width >= 64 && m.height >= 64 && m.n_frames >= 1)
    }
    // partitioning must not change results (pure per-row kernel)
    f1.foreach { case (id, m) =>
      assert(f2(id).features.toSeq == m.features.toSeq)
      assert(f2(id).width == m.width)
    }
  }

  test("frame sampling stub: stride and cap") {
    assert(Multimodal.sampleFrameIndexes(10, 3, 10) == Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrameIndexes(100, 1, 5) == Seq(0, 1, 2, 3, 4))
    assert(Multimodal.sampleFrameIndexes(0, 1, 5).isEmpty)
  }
}
