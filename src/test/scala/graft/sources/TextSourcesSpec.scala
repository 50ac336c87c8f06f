package graft.sources

import graft.SparkSpec

/** Contract tests for the CSV/JSONL source adapters: the happy path is
  * oracle-proven end to end by t106/t107's content-addressed manifests;
  * these pin the STRICTNESS posture (FAILFAST — a malformed row in a
  * reproducibility-pinned corpus is a stop-the-world event, not a
  * silent null) and the schema contract. */
class TextSourcesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("adapters read back the full corpus with the declared schema") {
    val base = graft.Tables(spark, dir, "documents")
    val csv = TextSources.documentsCsv(spark, dir)
    val jsonl = TextSources.documentsJsonl(spark, dir)
    assert(csv.schema == TextSources.documentsSchema)
    assert(jsonl.schema == TextSources.documentsSchema)
    assert(csv.count() == base.count() && jsonl.count() == base.count())
  }

  test("FAILFAST: a malformed row aborts the read instead of yielding nulls") {
    val root = graft.TempTrees.scratch("graft-sources-spec")
    graft.TempTrees.deleteOnExit(root)
    // CSV with a non-numeric doc_id: schema says LongType -> malformed
    val badCsv = root.resolve("bad_csv")
    java.nio.file.Files.createDirectories(badCsv)
    java.nio.file.Files.write(badCsv.resolve("part-00000.csv"),
      "doc_id,text,lang,source,n_chars\nnot_a_number,hello,en,src0,5\n"
        .getBytes("UTF-8"))
    val csvRead = spark.read.schema(TextSources.documentsSchema)
      .option("header", "true").option("mode", "FAILFAST")
      .csv(badCsv.toString)
    assertThrows[org.apache.spark.SparkException](csvRead.collect())
    // JSONL with a truncated line
    val badJson = root.resolve("bad_jsonl")
    java.nio.file.Files.createDirectories(badJson)
    java.nio.file.Files.write(badJson.resolve("part-00000.json"),
      "{\"doc_id\": 1, \"text\": \"ok\", \"lang\": \"en\", \"source\": \"s\", \"n_chars\": 2}\n{\"doc_id\": 2, \"text\": \"broken\n"
        .getBytes("UTF-8"))
    val jsonRead = spark.read.schema(TextSources.documentsSchema)
      .option("mode", "FAILFAST").json(badJson.toString)
    assertThrows[org.apache.spark.SparkException](jsonRead.collect())
  }
}
