package graft.functions

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("shingles produce word n-grams; short docs shingle whole") {
    val df = Seq("a b c d", "x").toDF("text")
    val out = df.select(TextFunctions.shingles($"text", 2).as("s")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b c", "c d"))
    assert(out(1) == Seq("x"))
  }

  test("bpe-ish token count splits words, digits, punctuation") {
    val df = Seq("Hello, world! 42 times").toDF("text")
    // Hello , world ! 4 2 times → 7
    val n = df.select(TextFunctions.tokenCount($"text").as("n")).as[Long].head()
    assert(n == 7)
  }

  test("simhash: identical docs equal; near docs close; far docs far") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "the quick brown fox jumps over the lazy dog near the river edge",
      "completely different words about database systems and query planning"
    ).toDF("text")
    val h = df.select(TextFunctions.simhash64(TextFunctions.tokens($"text")).as("h"))
      .as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(0)) == 0)
    assert(ham(h(0), h(1)) < ham(h(0), h(2)))
    assert(ham(h(0), h(1)) <= 16)
  }

  test("rolling hash is order-sensitive and deterministic") {
    val df = Seq("abc", "acb", "abc").toDF("text")
    val h = df.select(TextFunctions.rollingHash($"text").as("h")).as[Long].collect()
    assert(h(0) == h(2))
    assert(h(0) != h(1))
  }

  test("language id picks the marker-heavy language, und when nothing matches") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "der hund ist nicht in der wohnung und ich bin da",
      "le chat est dans la maison et il est pour le mieux",
      "zzz qqq xxx").toDF("text")
    val langs = df.select(TextFunctions.langId($"text").as("l")).as[String].collect()
    assert(langs.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("native langId matches the composed version on fixture documents") {
    val d = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = d.select(
      TextFunctions.langId($"text").as("composed"),
      TextFunctions.langIdFast($"text").as("native"))
    assert(both.filter($"composed" =!= $"native").count() == 0)
  }

  test("native langId handles the marker/tie/und cases like the composed one") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "der hund ist nicht in der wohnung und ich bin da",
      "zzz qqq xxx").toDF("text")
    val langs = df.select(TextFunctions.langIdFast($"text").as("l")).as[String].collect()
    assert(langs.toSeq == Seq("en", "de", "und"))
  }

  test("jaccard on shingle sets: identical=1, disjoint=0") {
    val df = Seq(("a b c", "a b c"), ("a b c", "x y z")).toDF("t1", "t2")
    val j = df.select(TextFunctions.jaccard(
      TextFunctions.shingles($"t1", 1), TextFunctions.shingles($"t2", 1)).as("j"))
      .as[Double].collect()
    assert(j(0) == 1.0 && j(1) == 0.0)
  }

  test("canonicalUrl strips utm params individually, keeping real params") {
    def canon(urls: String*): Seq[String] =
      urls.toDF("u").select(TextFunctions.canonicalUrl($"u").as("c"))
        .as[String].collect().toSeq
    // non-utm params that FOLLOW a utm param must survive — collapsing
    // ?utm_source=x&id=5 and ?utm_source=x&id=6 to one key is data loss
    assert(canon(
      "https://example.com/p?utm_source=x&id=5",
      "https://example.com/p?utm_source=x&id=6") ==
      Seq("https://example.com/p?id=5", "https://example.com/p?id=6"))
    // runs of consecutive utm params strip in one pass, mid and trailing
    assert(canon("https://example.com/p?utm_a=1&utm_b=2&id=5&utm_c=3") ==
      Seq("https://example.com/p?id=5"))
    // an all-utm query drops entirely, including a dangling '&' tail
    assert(canon(
      "https://example.com/p?utm_a=1&utm_b=2",
      "https://example.com/p?utm_a=1&") ==
      Seq("https://example.com/p", "https://example.com/p"))
    // the classic variants still collapse: case, www, :443, fragment, slash
    assert(canon(
      "HTTPS://WWW.Example.COM:443/P/#frag",
      "https://example.com/P/",
      "https://example.com/P?utm_source=x") ==
      Seq("https://example.com/p", "https://example.com/p", "https://example.com/p"))
    // params containing 'utm_' NOT at a separator boundary are untouched
    assert(canon("https://example.com/p?myutm_x=1") ==
      Seq("https://example.com/p?myutm_x=1"))
  }
}
