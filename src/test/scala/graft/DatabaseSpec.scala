package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Milvus databases (2.3+ — `db.create_database` / `using_database` /
  * `list_database` / `drop_database`): namespaces above collections,
  * the multi-tenant layer. Pins: the "default" database IS the
  * pre-database layout (backward compat), complete cross-database
  * isolation (same collection name, independent data and catalog),
  * the non-empty/default drop refusals, and that the whole data path
  * (upsert/search/index) runs unchanged inside a named database. */
class DatabaseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("database-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def vec(i: Int): Seq[Float] =
    Seq.tabulate(4)(j => ((i * 31 + j * 7) % 101) / 101.0f)

  test("create/list/drop lifecycle; default always exists") {
    val root = java.nio.file.Files.createTempDirectory("graft-db").toString
    val c = new GraftClient(spark, root)
    assert(c.databaseName == "default")
    assert(c.listDatabases() == Seq("default"))
    assert(c.createDatabase("tenant_a"))
    assert(!c.createDatabase("tenant_a")) // idempotent
    assert(c.createDatabase("tenant_b"))
    assert(c.listDatabases() == Seq("default", "tenant_a", "tenant_b"))

    // default can never be dropped or re-created
    intercept[IllegalArgumentException] { c.dropDatabase("default") }
    intercept[IllegalArgumentException] { c.createDatabase("default") }
    // using a nonexistent database raises (Milvus does the same)
    intercept[IllegalArgumentException] { c.usingDatabase("nope") }

    assert(c.dropDatabase("tenant_b"))
    assert(!c.dropDatabase("tenant_b")) // already gone
    assert(c.listDatabases() == Seq("default", "tenant_a"))
  }

  test("cross-database isolation: same collection name, independent " +
       "catalog, data and indexes; non-empty drop refused") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-db2").toString
    val admin = new GraftClient(spark, root)
    admin.createDatabase("ta")
    admin.createDatabase("tb")
    val ca = admin.usingDatabase("ta")
    val cb = admin.usingDatabase("tb")
    assert(ca.databaseName == "ta")

    // the SAME collection name in three databases — independent rows
    Seq(admin, ca, cb).zipWithIndex.foreach { case (c, off) =>
      c.createCollection("docs", dim = 4, buckets = 2)
      c.upsert("docs", (0 until 5).map(i =>
        (s"k${off}_$i", vec(i + off * 100), Map("db" -> c.databaseName)))
        .toDF("key", "vec", "meta"))
    }
    assert(admin.list() == Seq("docs") && ca.list() == Seq("docs"))
    assert(admin.count("docs") == 5 && ca.count("docs") == 5)
    assert(ca.fetch("docs", Seq("ta_isolated_missing")).count() == 0)
    // each database's rows carry its own keys — no bleed-through
    assert(ca.search("docs", vec(101).toArray, k = 1).collect()
      .head.getString(0).startsWith("k1_"))
    assert(cb.search("docs", vec(202).toArray, k = 1).collect()
      .head.getString(0).startsWith("k2_"))
    assert(admin.search("docs", vec(1).toArray, k = 1).collect()
      .head.getString(0).startsWith("k0_"))

    // indexes build inside the named database's own storage tree
    ca.buildIndex("docs", nlist = 2)
    assert(ca.listIndexes("docs").collect().exists(_.getBoolean(2)))
    assert(admin.listIndexes("docs").collect().isEmpty,
      "an index built in ta must not appear in default's docs")

    // a database with collections refuses to drop; empty it and retry
    val e = intercept[IllegalArgumentException] { admin.dropDatabase("ta") }
    assert(e.getMessage.contains("docs"))
    ca.drop("docs")
    assert(admin.dropDatabase("ta"))
    // tb untouched throughout
    assert(cb.count("docs") == 5)
  }

  test("aliases and SQL views are database-scoped: no cross-database " +
       "resolution, named databases prefix their temp views") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-db4").toString
    val admin = new GraftClient(spark, root)
    admin.createDatabase("ta")
    val ca = admin.usingDatabase("ta")
    admin.createCollection("docs", dim = 4, buckets = 2)
    admin.upsert("docs", Seq(("d1", vec(1), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    ca.createCollection("docs", dim = 4, buckets = 2)
    ca.upsert("docs", (0 until 2).map(i =>
        (s"t$i", vec(i), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))

    // an alias created in default's catalog does NOT resolve in ta
    admin.createAlias("d", "docs")
    assert(ca.listAliases().isEmpty)
    intercept[IllegalArgumentException] { ca.describe("d") }
    assert(admin.describe("d").name == "docs")

    // temp views are session-global, catalogs are database-scoped — a
    // named database's views register under `<db>_` so two databases'
    // same-named collections never silently shadow each other
    admin.registerSqlViews()
    ca.registerSqlViews()
    assert(spark.table("docs").count() == 1)
    assert(spark.table("ta_docs").count() == 2)
    assert(spark.table("ta_graft_collections").select("name")
      .collect().map(_.getString(0)).toSeq == Seq("docs"))
    // default's alias must not register under ta's prefix
    intercept[Exception] { spark.table("ta_d") }
  }

  test("database-scope SWEEP (r17 — VERDICT r16's #3): the full client " +
       "surface inside a named database; layouts under root/databases/" +
       "<db>; same-named collections share NOTHING across databases") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dbsw").toString
    val admin = new GraftClient(spark, root)
    admin.createDatabase("sw")
    val cs = admin.usingDatabase("sw")
    // same collection name in default with a DIFFERENT dim: any shared
    // index dir or loaded-frame cache entry would misdimension a search
    // or cross rows between tenants
    admin.createCollection("docs", dim = 4, indexType = "IVF_FLAT",
      buckets = 2)
    admin.upsert("docs", (0 until 12).map(i =>
        (s"k0_$i", vec(i), Map("grp" -> s"g${i % 2}")))
      .toDF("key", "vec", "meta"))
    def vec6(i: Int): Seq[Float] =
      Seq.tabulate(6)(j => ((i * 13 + j * 11) % 97) / 97.0f)
    cs.createCollection("docs", dim = 6, indexType = "IVF_FLAT",
      buckets = 2)
    cs.upsert("docs", (0 until 12).map(i =>
        (s"s_$i", vec6(i), Map("grp" -> s"g${i % 2}")))
      .toDF("key", "vec", "meta"))
    // layout placement: the named db's data lives under its own tree
    assert(cs.describe("docs").dataPath.startsWith(s"$root/databases/sw/"),
      cs.describe("docs").dataPath)
    assert(!admin.describe("docs").dataPath.contains("/databases/"))
    // index build on BOTH sides — dirs derive from each db's dataPath
    cs.buildIndex("docs", nlist = 2)
    admin.buildIndex("docs", nlist = 2)
    assert(cs.listIndexes("docs").collect().exists(_.getBoolean(2)))
    assert(admin.listIndexes("docs").collect().exists(_.getBoolean(2)))
    // search family in the named db, all arms, index fresh
    val q6 = vec6(3).toArray
    assert(cs.search("docs", q6, k = 1, nprobe = 2)
      .head.getString(0) == "s_3")
    assert(cs.searchRange("docs", q6, radius = 1e9).count() == 12)
    assert(cs.searchGrouped("docs", q6, k = 2, groupByKey = "grp")
      .count() == 2)
    assert(cs.searchBatch("docs", Seq((1L, vec6(3))).toDF("qid", "qvec"),
      k = 1).head.getString(1) == "s_3")
    assert(cs.searchIterator("docs", q6, batchSize = 5)
      .flatMap(_.map(_.getString(0))).toSeq.size == 12)
    assert(cs.queryIterator("docs", col("key") > "", batchSize = 5)
      .flatMap(_.map(_.getString(0))).forall(_.startsWith("s_")))
    assert(cs.queryWhere("docs", col("key") === "s_7").count() == 1)
    assert(cs.get("docs", "s_7").isDefined && cs.get("docs", "k0_7").isEmpty)
    // scalar index + milvus grammar; estimateRecall; recommendIndex
    cs.createScalarIndex("docs", "grp")
    assert(cs.queryMilvus("docs", """grp == "g1"""").count() == 6)
    assert(cs.estimateRecall("docs", k = 3, nprobe = 2) > 0.0)
    assert(cs.recommendIndex("docs", sampleSize = 8).sampledRows >= 8)
    // text index + full-text + hybrid, all under the db tree
    val docsDf = (0 until 12).map(i =>
      (s"s_$i", s"alpha doc number $i " + (if (i == 3) "magnet" else "")))
      .toDF("key", "text")
    cs.buildTextIndex("docs", docsDf)
    assert(cs.fullTextSearch("docs", "magnet", k = 3)
      .head.getString(0) == "s_3")
    assert(cs.hybridSearchText("docs", "magnet", q6, k = 3)
      .head.getString(0) == "s_3")
    // load: the loaded-frame cache keys on the db-scoped path — load
    // BOTH same-named collections and re-search; a shared entry would
    // serve 4-dim frames to the 6-dim search (or cross tenants' rows)
    cs.loadCollection("docs")
    admin.loadCollection("docs")
    assert(cs.search("docs", q6, k = 1).head.getString(0) == "s_3")
    assert(admin.search("docs", vec(3).toArray, k = 1)
      .head.getString(0) == "k0_3")
    // maintenance surfaces
    cs.flush("docs")
    cs.compact("docs")
    // streaming ingest INSIDE the named database
    cs.createCollection("stream_docs", dim = 6, buckets = 2)
    val landing = s"$root/landing_sw"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "events.json"),
      Seq(TestDirs.notif("ObjectCreated:Put", "doc-a"),
        TestDirs.notif("ObjectCreated:Put", "doc-b")).mkString("\n").getBytes)
    val emb = graft.ingest.HashingEmbedder(6)
    cs.startIngest("stream_docs", landing,
        Seq(("doc-a", "alpha text"), ("doc-b", "beta text")).toDF("key", "text"),
        embedder = emb)
      .awaitTermination(120000)
    assert(cs.count("stream_docs") == 2)
    assert(cs.describe("stream_docs").dataPath
      .startsWith(s"$root/databases/sw/"))
    // default's view of the world: untouched by the whole sweep
    assert(admin.count("docs") == 12)
    assert(admin.list().sorted == Seq("docs"))
    assert(admin.search("docs", vec(5).toArray, k = 1)
      .head.getString(0) == "k0_5")
    // and nothing of the sweep leaked outside root/databases/sw: every
    // index artifact dir under the db root, none beside default's data
    val swBytes = TestDirs.dirBytes(s"$root/databases/sw")
    assert(swBytes > 0L)
  }

  test("dashed database names register SQL views (prefix sanitized " +
       "'-'→'_' like the names it prefixes)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-db5").toString
    val admin = new GraftClient(spark, root)
    admin.createDatabase("tenant-a") // dashes are legal database names
    val ca = admin.usingDatabase("tenant-a")
    ca.createCollection("docs-x", dim = 4, buckets = 2)
    ca.upsert("docs-x", Seq(("k1", vec(1), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    // a raw dashed prefix would make createOrReplaceTempView throw
    // ParseException and take down the whole SQL surface for the db
    ca.registerSqlViews()
    assert(spark.table("tenant_a_docs_x").count() == 1)
    assert(spark.table("tenant_a_graft_collections").count() == 1)
  }

  test("cross-database view shadowing refused: a default-db name " +
       "matching another database's '<db>_' prefix fails loudly") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-db6").toString
    val admin = new GraftClient(spark, root)
    admin.createDatabase("tz")
    val cz = admin.usingDatabase("tz")
    // default-db collection 'tz_docs' and database 'tz' collection
    // 'docs' both land on temp view 'tz_docs' — whichever registered
    // last would silently win without the session-global claim check
    admin.createCollection("tz_docs", dim = 4, buckets = 2)
    admin.upsert("tz_docs", Seq(("d1", vec(1), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    cz.createCollection("docs", dim = 4, buckets = 2)
    cz.upsert("docs", Seq(("z1", vec(2), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    admin.registerSqlViews()
    val e = intercept[IllegalArgumentException] { cz.registerSqlViews() }
    assert(e.getMessage.contains("tz_docs"))
    // resolve it: the owner re-registers after dropping the colliding
    // collection — its claims are replaced wholesale, freeing the name
    admin.drop("tz_docs")
    admin.registerSqlViews()
    cz.registerSqlViews()
    assert(spark.table("tz_docs").count() == 1)
    assert(spark.table("tz_docs").head.getString(0) == "z1")
  }

  test("pre-database roots read unchanged as database 'default'") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-db3").toString
    // a client created the old way (no databases anywhere on disk)
    val old = new GraftClient(spark, root)
    old.createCollection("legacy", dim = 4, buckets = 2)
    old.upsert("legacy", Seq(("k1", vec(1), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    // a new client sees it in "default" with zero migration
    val fresh = new GraftClient(spark, root)
    assert(fresh.listDatabases() == Seq("default"))
    assert(fresh.list() == Seq("legacy"))
    assert(fresh.count("legacy") == 1)
  }
}
