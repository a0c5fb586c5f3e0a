package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the corpus-curation keys (decontamination, PII
  * redaction, content-hash splits, sequence packing) on planted data —
  * the DuckDB oracle proves engine parity; these prove the operators
  * mean what they claim.
  */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags exactly the docs sharing eval shingles") {
    val docs = Seq(
      (0L, "the shared benchmark passage appears verbatim right here"),   // eval (id%50==0)
      (1L, "a training document with the shared benchmark passage inside"), // contaminated
      (2L, "entirely unrelated clean training content about something else"),
      (50L, "another eval document with different wording altogether")    // eval
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text")
    val evalSh = sh.filter($"id" % 50 === 0).select("s").distinct()
    val flagged = sh.filter($"id" % 50 =!= 0)
      .join(broadcast(evalSh), Seq("s"))
      .groupBy("id").agg(countDistinct($"s").as("n_shared"))
      .select("id").as[Long].collect().toSet
    assert(flagged.contains(1L), "doc sharing the benchmark passage is flagged")
    assert(!flagged.contains(2L), "clean doc is not flagged")
  }

  test("curation pipeline composes the stages with the right semantics") {
    val out = graft.SparkEntry.queries("ext_curation_pipeline")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(3)))).toMap
    assert(out.nonEmpty)
    // eval docs (every 50th) are the benchmark, never corpus output
    assert(out.keySet.forall(id => id % 50 != 0))
    // re-crawled duplicates (+10000 ids) always lose to their original
    // (min-id representative), so none can survive
    assert(out.keySet.forall(_ < 10000), "a planted duplicate survived dedup")
    // redaction: planted-PII survivors have a changed fingerprint,
    // clean survivors pass through byte-identical
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "md5(text) fp").as[(Long, String)].collect().toMap
    out.foreach { case (id, (_, redFp)) =>
      if (id % 7 == 0) assert(redFp != src(id), s"doc $id PII not redacted")
      else assert(redFp == src(id), s"doc $id text corrupted by pipeline")
    }
    // every stage bites: quality gate, contamination, and dedup each
    // removed someone (312 quality survivors at this SF; output smaller)
    assert(out.size < 312)
  }

  test("stage accounting reconciles exactly with the pipeline's survivors") {
    val survivors = graft.SparkEntry.queries("ext_curation_pipeline")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val outcomes = graft.SparkEntry.queries("ext_curation_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outcomes("kept") == survivors.size,
      s"stats kept=${outcomes.get("kept")} vs pipeline ${survivors.size}")
    assert(outcomes.contains("duplicate") && outcomes("duplicate") > 0)
    assert(outcomes.keySet.subsetOf(Set("kept", "duplicate", "contaminated",
      "too_short", "too_long", "token_shape", "low_stopword")))
  }

  test("PII redaction removes planted emails and phones, counts them") {
    val out = graft.SparkEntry.queries("ext_pii_redact")(spark, sfDir)
    val planted = out.filter($"doc_id" % 7 === 0)
    assert(planted.filter($"n_email" >= 1 && $"n_phone" >= 1).count() == planted.count())
    assert(planted.filter($"red_text".contains("@")).count() == 0, "no emails survive")
    assert(planted.filter($"red_text".contains("[EMAIL]")).count() == planted.count())
    val clean = out.filter($"doc_id" % 7 =!= 0)
    assert(clean.filter($"n_email" === 0).count() == clean.count())
  }

  test("hash split is content-keyed: stable across reorder, covers all docs") {
    val s1 = graft.SparkEntry.queries("ext_split_hash")(spark, sfDir)
      .as[(Long, String)].collect().toMap
    // identical text in a different row order gets the identical split
    val reordered = Tables.t(spark, sfDir, "documents").orderBy(desc("doc_id"))
    val s2 = reordered
      .withColumn("h", substring(md5($"text"), 1, 1))
      .select($"doc_id",
        when($"h".isin("c", "d"), "val")
          .when($"h".isin("e", "f"), "test")
          .otherwise("train").as("split"))
      .as[(Long, String)].collect().toMap
    assert(s1 == s2)
    assert(Set("train", "val", "test").subsetOf(s1.values.toSet))
    // expected proportions (12/2/2 of 16 hex chars), loose bounds
    val n = s1.size.toDouble
    assert(s1.values.count(_ == "train") / n > 0.5)
  }

  test("sequence packing fills shard-local bins in order under the budget") {
    val out = graft.SparkEntry.queries("ext_seq_pack")(spark, sfDir)
      .select("shard", "doc_id", "n_tokens", "bin")
      .as[(Long, Long, Int, Long)].collect()
    for ((_, docs) <- out.groupBy(_._1)) {
      val sorted = docs.sortBy(_._2)
      // bins are non-decreasing in doc order and start at 0
      assert(sorted.head._4 == 0L)
      assert(sorted.sliding(2).forall { case Array(a, b) => b._4 >= a._4; case _ => true })
      // each doc's bin equals prefix-tokens-before-it / 512
      var prefix = 0L
      for ((_, _, nt, bin) <- sorted) {
        assert(bin == prefix / 512, s"bin $bin vs prefix $prefix")
        prefix += nt
      }
    }
  }

  test("soft-dedup weights: each group's weights sum to exactly 1") {
    val out = graft.SparkEntry.queries("ext_dedup_weights")(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    // planted groups: %20 docs appear 3×, %10-but-not-%20 docs 2×,
    // the rest once — weights are exactly 1/n
    out.foreach { case (_, n, w) => assert(w == 1.0 / n, s"$w vs 1/$n") }
    val byCopies = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byCopies.keySet == Set(1L, 2L, 3L))
    // total weight = number of distinct contents
    val totalW = out.map(_._3).sum
    val distinctGroups = out.map(r => (r._2, r._1 % 10000)).distinct
    assert(math.abs(totalW - out.groupBy(_._2).map {
      case (n, rows) => rows.length.toDouble / n }.sum) < 1e-9)
    assert(distinctGroups.nonEmpty)
  }

  test("domain filter: blocked domains flagged, everything else kept") {
    val out = graft.SparkEntry.queries("ext_domain_filter")(spark, sfDir)
      .as[(Long, String, Boolean)].collect()
    val blocked = Set("src3.example.com", "src7.example.com",
      "src13.example.com")
    out.foreach { case (_, dom, kept) =>
      assert(kept == !blocked(dom), s"$dom kept=$kept")
      assert(!dom.startsWith("www."), dom)
    }
    assert(out.exists(!_._3) && out.exists(_._3))
  }
}
