package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Doc, Span}

/** Deterministic interleaved-document fixture generator (FIXTURES.md §1).
  *
  * Input-hint schema (`BASELINE.json` input_hint): docs(doc_id string,
  * spans array<struct<kind,text,media_ref,offset>>). Ground-truth entities with
  * planted duplicate docs + seeded noise; every derived artifact (gold clusters,
  * labeled pairs) is a pure function of (seed, nEntities) so any scale can be
  * regenerated identically on any partitioning — generation is distributed via
  * `spark.range(nEntities)` and per-entity seeded RNGs, no driver-side data.
  */
object Fixtures {

  case class GoldRow(doc_id: String, entity_id: Long)

  // deterministic token pools (no external data)
  private val firstNames = Vector(
    "james", "mary", "john", "patricia", "robert", "jennifer", "michael", "linda",
    "william", "elizabeth", "david", "barbara", "richard", "susan", "joseph", "jessica",
    "thomas", "sarah", "charles", "karen", "olav", "ingrid", "lars", "astrid",
    "pierre", "camille", "henrik", "maren", "diego", "lucia", "ivan", "nadia",
    "peter", "hannah", "george", "sofia", "martin", "clara", "victor", "alice",
    "hugo", "elena", "oscar", "freya", "felix", "nora", "leon", "stella",
    "anton", "greta", "bruno", "irene", "pavel", "marta", "nils", "vera",
    "tobias", "paula", "stefan", "dora", "emil", "rosa", "viktor", "lena")
  private val lastNames = Vector(
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller", "davis",
    "rodriguez", "martinez", "hernandez", "lopez", "gonzalez", "wilson", "anderson",
    "thomas", "taylor", "moore", "jackson", "martin", "lee", "perez", "thompson",
    "white", "harris", "sanchez", "clark", "ramirez", "lewis", "robinson", "hansen",
    "berg", "walker", "young", "allen", "king", "wright", "scott", "torres",
    "nguyen", "hill", "flores", "green", "adams", "nelson", "baker", "hall",
    "rivera", "campbell", "mitchell", "carter", "roberts", "gomez", "phillips",
    "evans", "turner", "diaz", "parker", "cruz", "edwards", "collins", "reyes",
    "stewart", "morris")
  private val streets = Vector(
    "main", "oak", "pine", "maple", "cedar", "elm", "view", "washington", "lake",
    "hill", "park", "river", "church", "spring", "ridge", "forest", "meadow", "sunset")
  private val streetKinds = Vector("street", "avenue", "road", "lane", "drive", "way")
  private val cities = Vector(
    "springfield", "rivertown", "lakeside", "fairview", "georgetown", "salem",
    "clinton", "madison", "arlington", "ashland", "burlington", "manchester")
  private val fillerWords = Vector(
    "order", "invoice", "shipment", "contact", "ref", "note", "attached", "billing",
    "delivery", "account", "update", "record", "profile", "statement", "query")

  /** Tunables; defaults calibrated so the fixture MatchConfig separates
    * duplicates from co-blocked negatives with F1 >= 0.99 (BASELINE.json:2).
    *
    * `surnameSpace` = 0 keeps the classic 64-name pool (small-scale tests);
    * > 0 switches to synthetic syllabic surnames drawn from a space of that
    * size, so the soundex blocking-key cardinality grows with the corpus and
    * per-block pair counts stay bounded at bench scale (the 10^12-doc design
    * point needs K = O(N) keys, not K = 64).
    */
  case class GenConfig(
      seed: Long = 42L,
      maxDupsPerEntity: Int = 3,
      hotKeyFraction: Double = 0.05, // entities forced onto one hot surname (skew knob)
      typoProb: Double = 0.5,
      addressNoiseProb: Double = 0.5,
      phoneKeepProb: Double = 0.92,
      mediaShareProb: Double = 0.9,
      surnameSpace: Int = 0)

  private val syllables = Vector(
    "ka", "mo", "ri", "ta", "ven", "sol", "gar", "ber", "lin", "dor", "fen",
    "hul", "jas", "kor", "lam", "nor", "pel", "qui", "ros", "sam", "tor", "ul",
    "vor", "wes", "yar", "zel", "bran", "cor", "del", "far", "gol", "han")
  private val surnameEndings = Vector("son", "er", "by", "man", "vik")

  /** Deterministic synthetic surname #i (i < 32^3 * 5 ≈ 164k distinct). */
  private[pipeline] def syntheticSurname(i: Int): String = {
    val s1 = syllables(i % 32)
    val s2 = syllables((i / 32) % 32)
    val s3 = syllables((i / 1024) % 32)
    s1 + s2 + s3 + surnameEndings((i / 32768) % surnameEndings.size)
  }

  /** Ground-truth entity: canonical values all duplicates derive from. */
  private case class Entity(
      id: Long,
      first: String,
      last: String,
      houseNo: Int,
      street: String,
      streetKind: String,
      city: String,
      phone: String,
      media: Seq[String],
      nDups: Int)

  /** splitmix64 finalizer: decorrelates java.util.Random streams seeded from
    * nearby composite keys (consecutive raw seeds yield correlated first draws).
    */
  private def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33; z
  }

  private def rng(cfg: GenConfig, parts: Long*): Random =
    new Random(mix(parts.foldLeft(cfg.seed)((acc, p) => mix(acc * 1000003L + p))))

  private def entity(cfg: GenConfig, id: Long): Entity = {
    val r = rng(cfg, 1L, id)
    val hot = r.nextDouble() < cfg.hotKeyFraction
    val last =
      if (hot) "smith"
      else if (cfg.surnameSpace > 0) syntheticSurname(r.nextInt(cfg.surnameSpace))
      else lastNames(r.nextInt(lastNames.size))
    val phone = (1 to 8).map(_ => r.nextInt(10)).mkString
    val media = (0 until 1 + r.nextInt(3)).map(i => f"m://sha256/${r.nextLong().abs}%016x")
    Entity(
      id = id,
      first = firstNames(r.nextInt(firstNames.size)),
      last = last,
      houseNo = 1 + r.nextInt(200),
      street = streets(r.nextInt(streets.size)),
      streetKind = streetKinds(r.nextInt(streetKinds.size)),
      city = cities(r.nextInt(cities.size)),
      phone = "555" + phone,
      media = media,
      nDups = 1 + r.nextInt(cfg.maxDupsPerEntity))
  }

  /** One seeded typo: substitute/insert/delete one char at position >= 2 (keeps
    * the soundex-prefix blocking key stable for most duplicates).
    */
  private def typo(r: Random, s: String): String = {
    if (s.length < 4) return s
    val pos = 2 + r.nextInt(s.length - 2)
    r.nextInt(3) match {
      case 0 => s.updated(pos, ('a' + r.nextInt(26)).toChar) // substitute
      case 1 => s.substring(0, pos) + ('a' + r.nextInt(26)).toChar + s.substring(pos) // insert
      case _ => s.substring(0, pos) + s.substring(pos + 1) // delete
    }
  }

  private def caseNoise(r: Random, s: String): String = r.nextInt(3) match {
    case 0 => s.toUpperCase
    case 1 => if (s.nonEmpty) s.substring(0, 1).toUpperCase + s.substring(1) else s
    case _ => s
  }

  /** The duplicate documents of one entity (dup 0 = clean primary). */
  private def docsOf(cfg: GenConfig, e: Entity): Seq[Doc] =
    (0 until e.nDups).map { dupIx =>
      val r = rng(cfg, 2L, e.id, dupIx.toLong)
      val clean = dupIx == 0

      val name = {
        val last = if (!clean && r.nextDouble() < cfg.typoProb) typo(r, e.last) else e.last
        val first =
          if (!clean && r.nextDouble() < 0.08) e.first.substring(0, 1) // initial
          else if (!clean && r.nextDouble() < cfg.typoProb) typo(r, e.first)
          else e.first
        caseNoise(r, s"$first $last")
      }
      val address = {
        val kind =
          if (!clean && r.nextDouble() < cfg.addressNoiseProb)
            e.streetKind.substring(0, math.min(2, e.streetKind.length)) // "st", "av"...
          else e.streetKind
        val street = if (!clean && r.nextDouble() < 0.25) typo(r, e.street) else e.street
        caseNoise(r, s"${e.houseNo} $street $kind ${e.city}")
      }
      val phone: Option[String] =
        if (clean || r.nextDouble() < cfg.phoneKeepProb)
          Some(if (r.nextBoolean()) e.phone else s"(${e.phone.take(3)}) ${e.phone.drop(3)}")
        else None
      val media: Seq[String] =
        if (clean) e.media
        else e.media.filter(_ => r.nextDouble() < cfg.mediaShareProb)
      val freeText = (0 until r.nextInt(3)).map(_ =>
        (0 until 3 + r.nextInt(5)).map(_ => fillerWords(r.nextInt(fillerWords.size))).mkString(" "))

      // interleave spans with strictly increasing offsets and seeded gaps
      var off = r.nextInt(5)
      def nextOff(): Int = { val o = off; off += 1 + r.nextInt(7); o }
      val spans = Seq.newBuilder[Span]
      spans += Span("name", name, null, nextOff())
      freeText.take(1).foreach(t => spans += Span("text", t, null, nextOff()))
      spans += Span("address", address, null, nextOff())
      phone.foreach(p => spans += Span("phone", p, null, nextOff()))
      media.foreach(m => spans += Span("media", null, m, nextOff()))
      freeText.drop(1).foreach(t => spans += Span("text", t, null, nextOff()))

      Doc(f"d${e.id}%010d_$dupIx%02d", spans.result())
    }

  /** Distributed deterministic generation: one task row per entity. */
  def docs(spark: SparkSession, nEntities: Long, cfg: GenConfig = GenConfig()): Dataset[Doc] = {
    import spark.implicits._
    spark.range(nEntities).flatMap(id => docsOf(cfg, entity(cfg, id)))
  }

  /** Gold clusters: doc -> ground-truth entity (FIXTURES.md §2). */
  def goldClusters(spark: SparkSession, nEntities: Long, cfg: GenConfig = GenConfig()): Dataset[GoldRow] = {
    import spark.implicits._
    spark.range(nEntities).flatMap { id =>
      val e = entity(cfg, id)
      (0 until e.nDups).map(d => GoldRow(f"d${e.id}%010d_$d%02d", e.id))
    }
  }
}
