package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Round-trip checks for the non-Parquet tabular sources: the same rows must
  * come back through CSV and JSON-lines with an explicit schema, and feed
  * the same pipelines (word count over a CSV corpus equals the Parquet
  * one). */
class SourcesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.sf)
    .select("doc_id", "text", "lang")

  test("CSV round-trip: schema-on-read returns the exact corpus rows") {
    val path = "target/test-scratch/docs_csv"
    docs.write.mode("overwrite").option("header", "true").csv(path)
    val back = Tables.csv(spark, path, docs.schema)
    assert(back.schema === docs.schema)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("JSON-lines round-trip: schema-on-read returns the exact corpus rows") {
    val path = "target/test-scratch/docs_json"
    docs.write.mode("overwrite").json(path)
    val back = Tables.jsonLines(spark, path, docs.schema)
    // JSON read order follows the declared schema; compare row sets.
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.select(docs.columns.map(col): _*).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("a CSV corpus feeds the word-count pipeline identically to Parquet") {
    val path = "target/test-scratch/docs_csv"
    docs.write.mode("overwrite").option("header", "true").csv(path)
    val viaCsv = graft.operators.TextAnalytics
      .wordCountsText(Tables.csv(spark, path, docs.schema), "text")
      .orderBy(desc("cnt"), asc("word")).as[(String, Long)].collect().toSeq
    val viaParquet = graft.operators.TextAnalytics
      .wordCountsText(docs, "text")
      .orderBy(desc("cnt"), asc("word")).as[(String, Long)].collect().toSeq
    assert(viaCsv === viaParquet)
  }

  test("malformed JSON lines surface as null rows (PERMISSIVE), droppable on demand") {
    // At 100 TB some records WILL be broken; the library's contract is
    // Spark's PERMISSIVE default — a malformed line yields a null-filled
    // row (auditable, countable) rather than failing the job; DROPMALFORMED
    // opts into silent exclusion.
    val dir = java.nio.file.Paths.get("target", "test-scratch", "docs_badjson")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("part.json"),
      """{"doc_id": 1, "text": "good one", "lang": "en"}
        |{"doc_id": 2, "text": "also fine", "lang": "en"}
        |{not json at all
        |""".stripMargin)
    val schema = docs.schema
    val permissive = Tables.jsonLines(spark, dir.toString, schema)
    assert(permissive.count() === 3L)
    assert(permissive.filter(col("doc_id").isNull).count() === 1L,
      "the malformed line must surface as a null row, not vanish")
    val dropped = spark.read.schema(schema)
      .option("multiLine", "false").option("mode", "DROPMALFORMED")
      .json(dir.toString)
    assert(dropped.count() === 2L)
  }

  test("ORC round-trip with predicate pushdown into the ORC scan") {
    val path = "target/test-scratch/docs_orc"
    docs.write.mode("overwrite").orc(path)
    val back = Tables.orc(spark, path)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
    // The pushdown story carries over from Parquet: a doc_id predicate must
    // reach the ORC reader as a PushedFilter, not a post-scan Filter only.
    val filtered = back.filter(col("doc_id") < 10).select("doc_id", "lang")
    filtered.count()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id"),
      s"doc_id bound not pushed to the ORC scan:\n${plan.take(1500)}")
  }
}
