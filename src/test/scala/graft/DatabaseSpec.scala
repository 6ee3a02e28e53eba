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
