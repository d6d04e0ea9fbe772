package graft

import graft.pipeline.{Blocking, ErPipeline}
import graft.pipeline.ErPipeline.CleanRecord

/** Configurable blocking keyers (Duke KeyFunction analog, J3/J4). */
class BlockingSpec extends SparkSpec {

  private val rec = CleanRecord("d1", Map(
    "name" -> Seq("john smith", "j smyth"),
    "phone" -> Seq("5551234", "123"),
    "address" -> Seq("12 oak street salem")))

  test("default scheme == historical ErPipeline.blockKeys behavior") {
    assert(ErPipeline.blockKeys(rec).toSet === Set("n:S530", "p:5551234"))
  }

  test("keyers: soundex-last-token, exact, prefix, qgrams") {
    assert(Blocking.SoundexLastToken("name", "n:").keys(rec).toSet
      === Set("n:S530")) // smith and smyth share S530 -> distinct via keys()
    assert(Blocking.ExactValue("phone", "p:", minLen = 5).keys(rec) === Seq("p:5551234"))
    assert(Blocking.ValuePrefix("address", 6, "a:").keys(rec) === Seq("a:12 oak"))
    val grams = Blocking.QGrams("phone", 3, "g:").keys(rec)
    assert(grams.contains("g:555") && grams.contains("g:123"))
    // short value falls back to whole-value key
    assert(Blocking.QGrams("phone", 4, "g:").keys(
      CleanRecord("x", Map("phone" -> Seq("12")))) === Seq("g:12"))
  }

  test("custom scheme flows through the pipeline block stage") {
    import spark.implicits._
    val records = Seq(
      CleanRecord("a", Map("name" -> Seq("maria garcia"))),
      CleanRecord("b", Map("name" -> Seq("mario garcia"))),
      CleanRecord("c", Map("name" -> Seq("zoe lin")))).toDS()
    val keys = ErPipeline.block(records,
      Seq(Blocking.ValuePrefix("name", 4, "pfx:"))).collect()
    assert(keys.count(_.key == "pfx:mari") === 2)
    assert(keys.count(_.key == "pfx:zoe ") === 1)
  }
}
