package graft.ingest

import graft.SparkSpec
import graft.ops.Tables

class ColumnKindsSpec extends SparkSpec {
  test("kinds cover media, embedding, datetime, number, text") {
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, sfDir, "documents")
      .withColumn("bin", expr("encode(text, 'UTF-8')"))
    val emb = Tables.t(spark, sfDir, "embeddings")
    val ev = Tables.t(spark, sfDir, "events")

    val dk = Ingestor.columnKinds(docs.schema)
    assert(dk("bin") == "MEDIA")
    assert(dk("text") == "TEXT")
    assert(dk("n_chars") == "NUMBER")

    assert(Ingestor.columnKinds(emb.schema)("embedding") == "EMBEDDING")
    assert(Ingestor.columnKinds(ev.schema)("ts") == "DATETIME")
    assert(Ingestor.columnKinds(ev.schema)("value") == "NUMBER")
  }
}
