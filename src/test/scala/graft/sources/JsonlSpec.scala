package graft.sources

import graft.{SparkEntry, SparkSpec}

/** Scale properties of the JSONL corpus source (`scan_jsonl`): the
  * sink must emit a splittable multi-file layout (a single giant .json
  * file caps read parallelism at 1 task per file boundary), and the
  * read must NOT pay a schema-inference pass — at 100 TB inference is
  * a full extra scan of the corpus.
  */
class JsonlSpec extends SparkSpec {

  test("scan_jsonl round-trips documents losslessly") {
    val out = SparkEntry.queries("scan_jsonl")(spark, sfDir).collect()
    assert(out.length == 500)
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "length(text) n", "md5(text) fp")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    out.foreach { r =>
      val (n, fp) = src(r.getLong(0))
      assert(r.getInt(1) == n && r.getString(2) == fp,
        s"doc ${r.getLong(0)} corrupted through JSONL round-trip")
    }
  }

  test("jsonl sink preserves write parallelism (no coalesce in the path)") {
    SparkEntry.queries("scan_jsonl")(spark, sfDir).count() // ensure written
    val dir = new java.io.File(
      s"target/graft_tmp/scan_jsonl_${new java.io.File(sfDir).getName}")
    val parts = dir.listFiles().count(_.getName.startsWith("part-"))
    val inputParts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").rdd.getNumPartitions
    // At test SF documents is one parquet file → 1 input partition → 1
    // part file; the invariant under test is that the sink mirrors input
    // parallelism instead of coalescing, so at corpus scale (thousands of
    // input splits) the layout stays splittable.
    assert(parts == inputParts,
      s"JSONL sink wrote $parts part file(s) for $inputParts input partition(s)")
    // And the same sink path scales out: a multi-partition frame written
    // the same way yields one part per partition.
    val multi = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").repartition(4)
    val mdir = "target/graft_tmp/jsonl_multi_spec"
    multi.write.mode("overwrite").json(mdir)
    val mparts = new java.io.File(mdir).listFiles().count(_.getName.startsWith("part-"))
    assert(mparts == 4, s"expected 4 part files, got $mparts")
  }

  test("an interrupted first write (no _SUCCESS) is rewritten, not read") {
    val dir = new java.io.File(
      s"target/graft_tmp/scan_jsonl_${new java.io.File(sfDir).getName}")
    // simulate a killed first write: directory exists, marker doesn't
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    assert(dir.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(dir, "part-00000-partial.json").toPath, "{\"doc_id\":1}\n")
    val out = SparkEntry.queries("scan_jsonl")(spark, sfDir)
    assert(out.count() == 500, "poisoned layout was read instead of rewritten")
    assert(new java.io.File(dir, "_SUCCESS").isFile)
  }

  test("jsonl scan with explicit schema plans a single relation, no inference scan") {
    // With an explicit schema the DataFrameReader never touches the files
    // at plan time; a wrong column name would surface as an all-null
    // column, so also assert the projected values are non-null.
    val df = SparkEntry.queries("scan_jsonl")(spark, sfDir)
    assert(df.schema.map(_.name) == Seq("doc_id", "n_chars_m", "fp"))
    assert(df.filter("fp IS NULL OR n_chars_m IS NULL").count() == 0)
  }
}
