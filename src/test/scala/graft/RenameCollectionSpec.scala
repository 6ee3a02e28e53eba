package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftClient
import graft.ingest.Embedder

/** Milvus `rename_collection`: O(1) catalog re-key with every derived
  * layout (store, IVF, text, scalar — all keyed off the unchanged
  * dataPath) surviving intact, plus the two storage-safety guards the
  * kept-dataPath design requires: re-creating the old name must not
  * clear the renamed collection's storage, and a torn rename (both
  * names describing one path) must make drop refuse. */
class RenameCollectionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def mk(): (GraftClient, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft-ren").toString
    (new GraftClient(spark, root), root)
  }

  test("rename keeps data and every index fresh; hazards refused") {
    import spark.implicits._
    val (c, _) = mk()
    c.createCollection("olda", dim = 384)
    val docs = Seq(
      ("d1", "alpha join text", Map("src" -> "a")),
      ("d2", "beta scan text", Map("src" -> "b"))).toDF("key", "text", "meta")
    c.upsertTexts("olda", docs)
    c.buildIndex("olda", nlist = 2)
    c.buildTextIndex("olda", docs)
    c.createScalarIndex("olda", "src")

    // refusals first: reserved target, through-alias, aliased source
    assertThrows[IllegalArgumentException](c.renameCollection("olda", "x-parts"))
    c.createAlias("al", "olda")
    assertThrows[IllegalArgumentException](c.renameCollection("al", "newb"))
    assertThrows[IllegalArgumentException](c.renameCollection("olda", "newb"))
    c.dropAlias("al")
    c.createCollection("taken", dim = 4)
    assertThrows[IllegalArgumentException](c.renameCollection("olda", "taken"))

    c.renameCollection("olda", "newb")
    assert(c.list().contains("newb") && !c.list().contains("olda"))
    assertThrows[IllegalArgumentException](c.describe("olda"))
    // every index survived AND is still fresh under the new name
    val idx = c.listIndexes("newb").collect()
      .map(r => (r.getString(0), r.getBoolean(2))).toMap
    assert(idx == Map("IVF_FLAT" -> true, "TEXT" -> true, "SCALAR" -> true))
    val hit = c.search("newb", Embedder.text.embedText("alpha join"), k = 1,
      matchTerms = Seq("join"))
    assert(hit.collect().head.getString(0) == "d1")
    assert(c.queryWhere("newb",
      element_at(col("meta"), lit("src")) === "b").count() == 1)
    // writes keep maintaining the (renamed) indexes
    c.upsert("newb", Seq(("d3", Seq.fill(384)(0.1f), Map("src" -> "c")))
      .toDF("key", "vec", "meta"))
    assert(c.queryWhere("newb",
      element_at(col("meta"), lit("src")) === "c").count() == 1)
  }

  test("re-creating the renamed-away name cannot destroy the new name's storage") {
    import spark.implicits._
    val (c, _) = mk()
    c.createCollection("olda", dim = 4)
    c.upsert("olda", Seq(("k1", Seq(1f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    c.renameCollection("olda", "newb")
    val e = intercept[IllegalArgumentException](c.createCollection("olda", dim = 4))
    assert(e.getMessage.contains("newb"))
    // the refused create rolled its catalog entry back and touched nothing
    assert(!c.list().contains("olda"))
    assert(c.fetch("newb", Seq("k1")).count() == 1)
  }

  test("torn rename: drop refuses while two names share storage; recovery is entry removal") {
    import spark.implicits._
    val (c, root) = mk()
    c.createCollection("olda", dim = 4)
    c.upsert("olda", Seq(("k1", Seq(1f, 0f, 0f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    val oldJson = java.nio.file.Paths.get(s"$root/catalog/olda.json")
    val bytes = java.nio.file.Files.readAllBytes(oldJson)
    c.renameCollection("olda", "newb")
    // simulate the crash window: the old entry resurrected beside the new
    java.nio.file.Files.write(oldJson, bytes)
    assertThrows[IllegalArgumentException](c.drop("olda"))
    assertThrows[IllegalArgumentException](c.drop("newb"))
    // recovery: remove the stale entry, then drop works normally
    java.nio.file.Files.delete(oldJson)
    assert(c.drop("newb"))
  }
}
