package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Milvus `output_fields` on the search/query envelopes — the exact
  * parameter the reference passes (`output_fields=["url"]`,
  * `milvus-app/search.py:16`): dynamic fields project out of the meta
  * map as their own columns, id/distance always ship, and the vector is
  * a fetch concern, not a search payload. */
class OutputFieldsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("output-fields-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val client = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-outf").toString
    val c = new GraftClient(spark, root)
    c.createCollection("of", dim = 2, buckets = 4)
    c.upsert("of", Seq(
      ("a", Seq(1f, 0f), Map("url" -> "http://rgw/a", "grp" -> "x")),
      ("b", Seq(2f, 0f), Map("url" -> "http://rgw/b")))
      .toDF("key", "vec", "meta"))
    c
  }

  test("search output_fields projects meta fields; id+distance always ship") {
    val df = client.search("of", Array(0f, 0f), k = 2, outputFields = Seq("url"))
    assert(df.columns.toSeq == Seq("vector_key", "distance", "url"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(rows == Seq(("a", "http://rgw/a"), ("b", "http://rgw/b")))
  }

  test("a field absent from a row's meta is null, like Milvus dynamic fields") {
    val rows = client.searchMilvus("of", Array(0f, 0f), k = 2,
        filter = """url like "http%"""",
        outputFields = Seq("grp")).collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("x", null))
  }

  test("'*' and the default keep the full envelope; 'vec' is rejected loudly") {
    assert(client.search("of", Array(0f, 0f), k = 1, outputFields = Seq("*"))
      .columns.toSeq == Seq("vector_key", "distance", "metadata"))
    assert(client.search("of", Array(0f, 0f), k = 1)
      .columns.toSeq == Seq("vector_key", "distance", "metadata"))
    val e = intercept[IllegalArgumentException](
      client.search("of", Array(0f, 0f), k = 1, outputFields = Seq("vec")))
    assert(e.getMessage.contains("fetch"))
  }

  test("queryMilvus output_fields: key always ships, schema fields by name") {
    val df = client.queryMilvus("of", """url like "http%"""",
      outputFields = Seq("url", "meta"))
    assert(df.columns.toSeq == Seq("key", "url", "meta"))
    assert(df.collect().map(_.getString(1)).toSeq ==
      Seq("http://rgw/a", "http://rgw/b"))
    assert(client.queryWhere("of", org.apache.spark.sql.functions.lit(true),
        outputFields = Seq("vec"))
      .columns.toSeq == Seq("key", "vec"))
  }

  test("filtered count: query(output_fields=[count(*)]) — one row, limit rejected") {
    val one = client.queryMilvus("of", """url == "http://rgw/a"""",
      outputFields = Seq("count(*)"))
    assert(one.columns.toSeq == Seq("count(*)"))
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(client.queryMilvus("of", """url like "http%"""",
        outputFields = Seq("count(*)")).head().getLong(0) == 2L)
    // zero matches still returns exactly one row, count 0 — an agg, not
    // an empty frame
    assert(client.queryMilvus("of", """url == "nope"""",
        outputFields = Seq("count(*)")).head().getLong(0) == 0L)
    val e = intercept[IllegalArgumentException](
      client.queryMilvus("of", """url like "http%"""", limit = Some(5),
        outputFields = Seq("count(*)")).collect())
    assert(e.getMessage.contains("count(*)"))
  }

  test("count(*) mixed with other output fields is rejected, like Milvus") {
    // the fall-through would project element_at(meta, "count(*)") — an
    // all-null column — where Milvus errors on the mixed form
    for (fields <- Seq(Seq("count(*)", "url"), Seq("url", "count(*)"))) {
      val e = intercept[IllegalArgumentException](
        client.queryMilvus("of", """url like "http%"""",
          outputFields = fields).collect())
      assert(e.getMessage.contains("count(*)"))
    }
  }
}
