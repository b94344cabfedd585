package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val goodEn =
    "the quick brown fox jumps over the lazy dog and it runs for a long time " +
      "in the field with many other animals that live there happily for years"

  test("curation funnel drops junk, wrong-language, exact and near duplicates") {
    val rows = Seq(
      (1L, goodEn),                                         // keeper
      (2L, goodEn + " extra tail words here"),              // near-dup of 1 (dies)
      (3L, goodEn),                                         // exact dup of 1 (dies)
      (4L, "el la de que y en un los se por el la de que"), // spanish (dies)
      (5L, "!!! ??? *** !!! ??? *** !!! ???"),              // junk (dies)
      (6L, "a completely different and quite long document about the history " +
           "of computing that should survive every single stage of the funnel")
    ).toDF("doc_id", "text")

    val (curated, report) = CorpusPipeline.curate(rows,
      minQuality = 0.3, allowedLangs = Seq("en"), minJaccard = 0.8)

    report.input shouldBe 6
    report.afterQuality shouldBe 5          // junk gone
    report.afterLanguage shouldBe 4         // spanish gone
    report.afterExactDedup shouldBe 3       // exact dup gone
    report.afterNearDup shouldBe 2          // near-dup gone

    curated.select($"doc_id").as[Long].collect().sorted shouldBe Array(1L, 6L)
  }

  test("provenance labels every doc with its first killing stage and the responsible twin") {
    val rows = Seq(
      (1L, goodEn),                                         // survives
      (2L, goodEn + " extra tail words here"),              // near-dup of 1
      (3L, goodEn),                                         // exact dup of 1
      (4L, "el la de que y en un los se por el la de que"), // language
      (5L, "!!! ??? *** !!! ??? *** !!! ???"),              // quality
      (6L, "a completely different and quite long document about the history " +
           "of computing that should survive every single stage of the funnel")
    ).toDF("doc_id", "text")
    val prov = CorpusPipeline.provenance(rows, minQuality = 0.3,
        allowedLangs = Seq("en"), minJaccard = 0.8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    prov(1L) shouldBe ("survived", None)
    prov(2L) shouldBe ("near_dup", Some(1L))  // cluster representative
    prov(3L) shouldBe ("exact_dup", Some(1L)) // fingerprint-group winner
    prov(4L) shouldBe ("language", None)
    prov(5L) shouldBe ("quality", None)
    prov(6L) shouldBe ("survived", None)
    // the survivor set IS the curated set — same expressions, same rules
    val (curated, _) = CorpusPipeline.curate(rows, minQuality = 0.3,
      allowedLangs = Seq("en"), minJaccard = 0.8)
    prov.filter(_._2._1 == "survived").keySet shouldBe
      curated.select($"doc_id").as[Long].collect().toSet
    // one row per input doc, always
    prov.size shouldBe 6

    // NULL-text docs must label as a KILLING stage (three-valued NULL
    // gates must not fall through to 'survived' — curate drops them:
    // langIdCol(NULL) is NULL, which its filter treats as false)
    val withNull = rows.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val pn = CorpusPipeline.provenance(withNull, minQuality = 0.3,
        allowedLangs = Seq("en"), minJaccard = 0.8)
      .filter($"doc_id" === 9L).select($"stage").as[String].head()
    pn shouldBe "language"
    val (curatedN, _) = CorpusPipeline.curate(withNull, minQuality = 0.3,
      allowedLangs = Seq("en"), minJaccard = 0.8)
    curatedN.filter($"doc_id" === 9L).count() shouldBe 0L
  }

  test("curation keeps survivors' columns intact plus the scores") {
    val rows = Seq((1L, goodEn), (2L, goodEn.replace("fox", "cat"))).toDF("doc_id", "text")
    val (curated, _) = CorpusPipeline.curate(rows, minJaccard = 0.99)
    curated.columns should contain allOf ("doc_id", "text", "quality_score", "lang_pred")
    curated.filter($"quality_score" < 0.3).count() shouldBe 0
  }

  test("funnel on the real documents table is monotone and plans without cartesian") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val (curated, r) = CorpusPipeline.curate(docs, minQuality = 0.0,
      allowedLangs = Seq("en", "es", "fr", "de", "zh", "und"))
    r.input should be >= r.afterQuality
    r.afterQuality should be >= r.afterLanguage
    r.afterLanguage should be >= r.afterExactDedup
    r.afterExactDedup should be >= r.afterNearDup
    r.afterNearDup should be > 0L
    curated.queryExecution.executedPlan.toString().toLowerCase should not include "cartesian"
  }
}
