package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{GraftClient, MilvusFilter}

/** Milvus filter-string translation ([[MilvusFilter]]): the reference's
  * own `filter=` argument shape, checked end-to-end against hand-built
  * Column equivalents on a live collection — including the typed-compare
  * rules over string metadata and the scalar-index prune riding a string
  * filter unchanged. */
class MilvusFilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def seeded(): GraftClient = {
    import spark.implicits._
    val c = new GraftClient(spark,
      java.nio.file.Files.createTempDirectory("graft-mf").toString)
    c.createCollection("col", dim = 2)
    c.upsert("col", (0 until 30).map { i =>
      (s"k$i", Seq(i.toFloat, 0f), Map(
        "url" -> s"http://h/o$i",
        "price" -> (i * 3).toString,   // "0", "3", ... "87" — lexically unsorted
        "lang" -> (if (i % 3 == 0) "en" else "de"),
        "flag" -> (if (i % 2 == 0) "true" else "false")))
    }.toDF("key", "vec", "meta"))
    c
  }

  private def keys(c: GraftClient, f: String): Set[String] =
    c.queryWhere("col", c.milvusFilter(f)).select("key")
      .collect().map(_.getString(0)).toSet

  test("the reference's own delete-by-url shape, plus equality/IN/LIKE") {
    val c = seeded()
    assert(keys(c, """url == "http://h/o7"""") == Set("k7"))
    assert(keys(c, """url in ["http://h/o1", "http://h/o2"]""") == Set("k1", "k2"))
    assert(keys(c, """key == 'k3'""") == Set("k3"))
    assert(keys(c, """url like "http://h/o2%"""") ==
      Set("k2", "k20", "k21", "k22", "k23", "k24", "k25", "k26", "k27", "k28", "k29"))
    // and the reference's actual DELETE path accepts the same string,
    // as does filtered KNN
    assert(c.search("col", Array(0f, 0f), k = 1,
        filter = Some(c.milvusFilter("""url == "http://h/o7"""")))
      .collect().head.getString(0) == "k7")
    c.deleteWhere("col", c.milvusFilter("""url == "http://h/o7""""))
    assert(keys(c, """url == "http://h/o7"""") == Set.empty)
  }

  test("numeric literals compare numerically over string metadata, not lexically") {
    val c = seeded()
    // lexical "9" > "80"; numeric 9 < 80 — the cast is what makes this right
    assert(keys(c, "price > 80") == Set("k27", "k28", "k29"))
    assert(keys(c, "price >= 81 && price <= 84") == Set("k27", "k28"))
    assert(keys(c, "price in [0, 3, 87]") == Set("k0", "k1", "k29"))
    assert(keys(c, "flag == true && price > 80") == Set("k28"))
  }

  test("Milvus operator spellings: && || ! and not-!= disambiguation") {
    val c = seeded()
    assert(keys(c, """lang == "en" && price < 10""") == Set("k0", "k3"))
    assert(keys(c, """price > 84 || url == "http://h/o0"""") == Set("k0", "k29"))
    assert(keys(c, """!(price > 6) && lang != "de"""") == Set("k0"))
    assert(keys(c, """price != 0 && price < 7""") == Set("k1", "k2"))
  }

  test("a string filter on a scalar-indexed field bucket-prunes automatically") {
    val c = seeded()
    c.createScalarIndex("col", "url")
    val df = c.queryWhere("col", c.milvusFilter("""url == "http://h/o7""""))
    assert(df.select("key").collect().map(_.getString(0)).toSeq == Seq("k7"))
    assert(df.inputFiles.length <= 1, "one unique value must read one bucket")
    assert(c.queryWhere("col", c.milvusFilter("""url == "u-absent"""")).inputFiles.isEmpty)
  }

  test("preprocess corner spellings: in[ without space, not-in lists, escapes") {
    val c = seeded()
    assert(keys(c, """lang in["en"] && price < 10""") == Set("k0", "k3"))
    // prices 0,3,6,9 under 10 — NOT IN drops the first two numerically
    assert(keys(c, """price not in [0, 3] && price < 10""") == Set("k2", "k3"))
    // escaped quote inside a literal: the &&/[ ] inside stay untouched
    assert(keys(c, """url == "a\"b[!&&]c"""") == Set.empty)
  }

  test("unsupported Milvus functions fail loudly with the engine equivalent named") {
    val c = seeded()
    val e = intercept[IllegalArgumentException](
      c.milvusFilter("""TEXT_MATCH(text, "spark vector")"""))
    assert(e.getMessage.contains("matchTerms"))
    intercept[IllegalArgumentException](c.milvusFilter("   "))
    // brackets inside string literals survive preprocessing untouched
    assert(keys(c, """url == "a[!&&|]b"""") == Set.empty)
  }

  test("json_contains family over a JSON tags field, nested arrays included") {
    import spark.implicits._
    val c = new GraftClient(spark,
      java.nio.file.Files.createTempDirectory("graft-jc").toString)
    c.createCollection("jc", dim = 2)
    c.upsert("jc", Seq(
      ("k1", Seq(1f, 0f), Map("tags" -> """["python", "ml"]""")),
      ("k2", Seq(2f, 0f), Map("tags" -> """["rust", "db"]""")),
      ("k3", Seq(3f, 0f), Map("tags" -> """[1, 2, 3]""")),
      ("k4", Seq(4f, 0f), Map("tags" -> """[[1, 2], [3]]""")),
      ("k5", Seq(5f, 0f), Map("tags" -> """not json""")),
      ("k6", Seq(6f, 0f), Map("other" -> "x")))
      .toDF("key", "vec", "meta"))
    def ks(f: String): Set[String] =
      c.queryWhere("jc", c.milvusFilter(f)).select("key")
        .collect().map(_.getString(0)).toSet
    // string membership — and the hand-built Column twin agrees
    assert(ks("""json_contains(tags, "python")""") == Set("k1"))
    val twin = c.queryWhere("jc", array_contains(
        from_json(element_at(col("meta"), "tags"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), "python"))
      .select("key").collect().map(_.getString(0)).toSet
    assert(twin == Set("k1"))
    // numeric membership: 2.0 matches the JSON number 2
    assert(ks("""json_contains(tags, 2)""") == Set("k3"))
    assert(ks("""json_contains(tags, 2.0)""") == Set("k3"))
    // nested array membership, whitespace-insensitive
    assert(ks("""json_contains(tags, [1, 2])""") == Set("k4"))
    assert(ks("""json_contains(tags, [3])""") == Set("k4"))
    assert(ks("""json_contains(tags, [2, 1])""").isEmpty, "order is structural")
    // any / all
    assert(ks("""json_contains_any(tags, ["python", "rust"])""") == Set("k1", "k2"))
    assert(ks("""json_contains_all(tags, ["python", "ml"])""") == Set("k1"))
    assert(ks("""json_contains_all(tags, ["python", "rust"])""").isEmpty)
    // malformed / absent JSON matches nothing, never errors
    assert(ks("""json_contains(tags, "not")""").isEmpty)
    // composes with other conjuncts
    assert(ks("""json_contains(tags, "python") and key == "k1"""") == Set("k1"))
    // unquoted string element → loud error, not a silent null-compare
    val e = intercept[IllegalArgumentException](
      c.milvusFilter("""json_contains(tags, [python])"""))
    assert(e.getMessage.contains("quote"))
    // Milvus 2.4+ spells the same operators array_contains* — aliases
    assert(ks("""array_contains(tags, "python")""") == Set("k1"))
    assert(ks("""array_contains_any(tags, ["python", "rust"])""") == Set("k1", "k2"))
    assert(ks("""array_contains_all(tags, ["python", "ml"])""") == Set("k1"))
  }

  test("parseWithMatches splits match conjuncts; slop and non-top-level reject") {
    import graft.api.MilvusFilter
    val (p1, g1) = MilvusFilter.parseWithMatches(
      """TEXT_MATCH(text, 'spark vector') and price > 5""")
    assert(g1 == Seq((Seq("spark", "vector"), "any")) && p1.isDefined)
    val (p2, g2) = MilvusFilter.parseWithMatches(
      "PHRASE_MATCH(text, 'machine learning')")
    assert(g2 == Seq((Seq("machine", "learning"), "phrase")) && p2.isEmpty)
    val (p3, g3) = MilvusFilter.parseWithMatches(
      "PHRASE_MATCH(text, 'a b', 0) and TEXT_MATCH(text, 'c')")
    assert(g3 == Seq((Seq("a", "b"), "phrase"), (Seq("c"), "any")) && p3.isEmpty)
    // slop > 0 is supported since r11: it rides the mode string —
    // TextMatchSpec pins the sloppy-match semantics end to end
    val (p4, g4) = MilvusFilter.parseWithMatches("PHRASE_MATCH(text, 'a b', 2)")
    assert(g4 == Seq((Seq("a", "b"), "phrase:2")) && p4.isEmpty)
    val slop = intercept[IllegalArgumentException](
      MilvusFilter.parseWithMatches("PHRASE_MATCH(text, 'a b', -3)"))
    assert(slop.getMessage.contains("slop"))
    val orPos = intercept[IllegalArgumentException](
      MilvusFilter.parseWithMatches(
        """TEXT_MATCH(text, 'a') or price > 5"""))
    assert(orPos.getMessage.contains("TOP-LEVEL"))
    // plain parse still rejects match fns, naming the real surfaces
    val pm = intercept[IllegalArgumentException](
      MilvusFilter.parse("PHRASE_MATCH(text, 'a b')"))
    assert(pm.getMessage.contains("phrase") ||
      pm.getMessage.contains("milvusFilterWithMatches"))
  }

  test("unquoted string values fail loudly, mirroring Milvus's parse error") {
    val c = seeded()
    // Milvus rejects `lang == en` at parse (en is an unquoted value); the
    // bare-field rewrite must not quietly turn it into the null-compare
    // meta['lang'] == meta['en'] that matches NOTHING
    val e = intercept[IllegalArgumentException](c.milvusFilter("lang == en"))
    assert(e.getMessage.contains("quote") && e.getMessage.contains("en"),
      s"error must point at the missing quotes: ${e.getMessage}")
    intercept[IllegalArgumentException](c.milvusFilter("price > budget"))
    // properly quoted, the same comparison works
    assert(keys(c, """lang == "en"""").nonEmpty)
  }
}
