package graft

import java.nio.file.Files

import graft.core.Cleaners
import graft.io.Sources

/** Duke-style batch sources with per-column cleaner chains applied at ingest
  * (SURVEY.md §2.1 S4/S5).
  */
class SourcesSpec extends SparkSpec {

  test("csv source applies cleaner chains per column on read") {
    val dir = Files.createTempDirectory("graft-src").toString
    val csv =
      """name,phone,city
        |" John  SMITH ","(555) 123-4567",Oslo
        |"Doe, Jane",0047 22 11,Bergen
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(dir, "in.csv"), csv)
    val df = Sources.csv(spark, s"$dir/in.csv", Map(
      "name" -> Seq("trim", "lowercase-normalize"),
      "phone" -> Seq("phone-number")))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(
      ("john smith", "5551234567", "Oslo"),
      ("doe jane", "472211", "Bergen")))
  }

  test("jsonLines source, chain parity with Cleaners.chain") {
    val dir = Files.createTempDirectory("graft-src2").toString
    Files.writeString(java.nio.file.Paths.get(dir, "in.json"),
      """{"name": "  Élodie DuPont ", "id": 1}
        |{"name": "ACME AS", "id": 2}
        |""".stripMargin)
    val df = Sources.jsonLines(spark, s"$dir/in.json",
      Map("name" -> Seq("trim", "lowercase-normalize")))
    val got = df.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(got(1L) === Cleaners.chain(Seq("trim", "lowercase-normalize"), "  Élodie DuPont "))
    assert(got(2L) === "acme as")
  }

  test("ntriples source: parse, pivot by subject, multi-values, cleaners") {
    val dir = Files.createTempDirectory("graft-src3").toString
    val nt =
      """# people
        |<http://ex.org/p1> <http://xmlns.com/foaf/0.1/name> " Lars  Holm "@no .
        |<http://ex.org/p1> <http://ex.org/phone> "0047 22 11 33" .
        |<http://ex.org/p1> <http://ex.org/phone> "555-1234"^^<http://www.w3.org/2001/XMLSchema#string> .
        |<http://ex.org/p2> <http://xmlns.com/foaf/0.1/name> "Kari \"KK\" Berg" .
        |<http://ex.org/p2> <http://ex.org/homepage> <http://ex.org/kari> .
        |<http://ex.org/p2> <http://ex.org/ignored> "dropped" .
        |
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(dir, "in.nt"), nt)
    val df = Sources.ntriples(spark, s"$dir/in.nt",
      predicates = Map(
        "http://xmlns.com/foaf/0.1/name" -> "name",
        "http://ex.org/phone" -> "phone",
        "http://ex.org/homepage" -> "homepage"),
      cleaners = Map(
        "name" -> Seq("trim", "lowercase-normalize"),
        "phone" -> Seq("phone-number")))
    val rows = df.collect().map { r =>
      r.getAs[String]("doc_id") ->
        ((r.getSeq[String](r.fieldIndex("name")).toSet,
          r.getSeq[String](r.fieldIndex("phone")).toSet,
          r.getSeq[String](r.fieldIndex("homepage")).toSet))
    }.toMap
    assert(rows.keySet === Set("http://ex.org/p1", "http://ex.org/p2"))
    assert(rows("http://ex.org/p1") ===
      ((Set("lars holm"), Set("47221133", "5551234"), Set.empty[String])))
    assert(rows("http://ex.org/p2") ===
      ((Set("kari kk berg"), Set.empty[String], Set("http://ex.org/kari"))))
  }

  test("jdbc source reads through Spark's JDBC reader with cleaners (embedded Derby)") {
    val url = "jdbc:derby:memory:graftsrc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE people (id INT, name VARCHAR(64), phone VARCHAR(32))")
      st.execute("INSERT INTO people VALUES (1, ' John  SMITH ', '(555) 123'), (2, 'Doe, Jane', '0047 22')")
      st.close()
      val df = Sources.jdbc(spark, url, "people",
        cleaners = Map("NAME" -> Seq("trim", "lowercase-normalize"), "PHONE" -> Seq("phone-number")),
        partitionColumn = Some(("id", 0L, 2L, 2)))
      assert(df.rdd.getNumPartitions === 2) // partitioned range read, not one task
      val got = df.collect().map(r => r.getAs[Int]("ID") ->
        ((r.getAs[String]("NAME"), r.getAs[String]("PHONE")))).toMap
      assert(got === Map(1 -> (("john smith", "555123")), 2 -> (("doe jane", "4722"))))
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftsrc;drop=true")
      catch { case _: java.sql.SQLException => } // drop always "fails" with 08006
    }
  }

  test("sparql source: loopback endpoint, tabular + triple mode, paging, cleaners") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

    def cell(v: String) = s"""{"type":"literal","value":"$v"}"""
    def body(rows: String*) =
      s"""{"head":{"vars":["id","name","phone","p","o"]},
         |"results":{"bindings":[${rows.mkString(",")}]}}""".stripMargin

    val tabularRows = Seq(
      s"""{"id":${cell("http://ex.org/p1")},"name":${cell(" Lars  HOLM ")},"phone":${cell("(47) 22-11-33")}}""",
      s"""{"id":${cell("http://ex.org/p1")},"name":${cell("L. Holm")}}""",
      s"""{"id":${cell("http://ex.org/p2")},"name":${cell("Kari Berg")},"phone":${cell("555 1234")}}""")
    val triplePages = Seq(
      Seq(
        s"""{"id":${cell("a")},"p":${cell("name")},"o":${cell("ANNA")}}""",
        s"""{"id":${cell("a")},"p":${cell("phone")},"o":${cell("111-22")}}"""),
      Seq(s"""{"id":${cell("b")},"p":${cell("name")},"o":${cell("BO")}}"""),
      Seq())

    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seenQueries = new java.util.concurrent.CopyOnWriteArrayList[String]()
    server.createContext("/sparql", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        val q = java.net.URLDecoder.decode(
          x.getRequestURI.getRawQuery.stripPrefix("query="), "UTF-8")
        seenQueries.add(q)
        val resp =
          if (!q.contains("LIMIT")) body(tabularRows: _*)
          else {
            val off = q.split("OFFSET ")(1).trim.toInt
            body(triplePages.lift(off / 2).getOrElse(Seq()): _*)
          }
        val bytes = resp.getBytes("UTF-8")
        x.getResponseHeaders.add("Content-Type", "application/sparql-results+json")
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes); x.close()
      }
    })
    server.start()
    val ep = s"http://127.0.0.1:${server.getAddress.getPort}/sparql"
    try {
      // tabular: variables are properties; multi-valued collect per subject
      val tab = Sources.sparql(spark, ep, "SELECT ?id ?name ?phone WHERE {...}",
        idVar = "id",
        variables = Map("name" -> "name", "phone" -> "phone"),
        cleaners = Map("name" -> Seq("trim", "lowercase-normalize"),
          "phone" -> Seq("digits-only")))
      val rows = tab.collect().map { r =>
        r.getString(0) -> ((r.getSeq[String](1).toSet, r.getSeq[String](2).toSet))
      }.toMap
      assert(rows("http://ex.org/p1") === ((Set("lars holm", "l holm"), Set("47221133"))))
      assert(rows("http://ex.org/p2") === ((Set("kari berg"), Set("5551234"))))

      // triple mode with Duke-style paging (LIMIT 2 OFFSET 0/2/4)
      val tri = Sources.sparql(spark, ep, "SELECT ?id ?p ?o WHERE {...}",
        idVar = "id", variables = Map("name" -> "nm", "phone" -> "ph"),
        tripleMode = true, pageSize = 2, pagesPerRound = 3)
      val triRows = tri.collect().map { r =>
        r.getString(0) -> ((r.getSeq[String](1).toSet, r.getSeq[String](2).toSet))
      }.toMap
      assert(triRows === Map(
        "a" -> ((Set("ANNA"), Set("111-22"))),
        "b" -> ((Set("BO"), Set.empty[String]))))
      assert(seenQueries.toArray.count(_.toString.contains("LIMIT")) === 3) // 2 pages + empty stop
    } finally server.stop(0)
  }

  test("sparql distributed paging: multi-round executor-side fetch (VERDICT r3 #3)") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    // 9 bindings served LIMIT/OFFSET-faithfully; pageSize=2, pagesPerRound=2
    // with the geometric ramp -> rounds of widths 1,2,2 (offsets 0 | 2,4 |
    // 6,8), the last page short. The driver only ever collects per-page
    // COUNTS; page bodies flow through executor map tasks into the triples
    // frame.
    def cell(v: String) = s"""{"type":"literal","value":"$v"}"""
    val all = (0 until 9).map(i =>
      s"""{"id":${cell(s"s$i")},"p":${cell("name")},"o":${cell(s"N$i")}}""")
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.CopyOnWriteArrayList[String]()
    server.createContext("/sparql", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        val q = java.net.URLDecoder.decode(
          x.getRequestURI.getRawQuery.stripPrefix("query="), "UTF-8")
        seen.add(q)
        val (lim, off) =
          (q.split("LIMIT ")(1).trim.split(" ")(0).toInt, q.split("OFFSET ")(1).trim.toInt)
        val page = all.slice(off, off + lim)
        val resp = s"""{"head":{"vars":["id","p","o"]},
          |"results":{"bindings":[${page.mkString(",")}]}}""".stripMargin
        val bytes = resp.getBytes("UTF-8")
        x.getResponseHeaders.add("Content-Type", "application/sparql-results+json")
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes); x.close()
      }
    })
    server.start()
    val ep = s"http://127.0.0.1:${server.getAddress.getPort}/sparql"
    try {
      val df = Sources.sparql(spark, ep, "SELECT ?id ?p ?o WHERE {...}",
        idVar = "id", variables = Map("name" -> "nm"),
        tripleMode = true, pageSize = 2, pagesPerRound = 2)
      val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
      assert(got === (0 until 9).map(i => s"s$i" -> Set(s"N$i")).toMap)
      // exactly 5 page fetches (ramp 1+2+2) — no re-fetch on the count read
      // vs the triple union (the round pin makes each page one HTTP request),
      // and no guaranteed-empty full first round for small result sets
      assert(seen.size === 5, s"expected 5 page fetches, saw: ${seen.size}")
    } finally server.stop(0)
  }

  test("JDBC link store: links round-trip; verdicts feed LinkJob overrides") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftlinks;create=true"
    try {
      val classified = Seq(
        ("d2", "d1", "match", 0.97),
        ("d3", "d4", "maybe", 0.72),
        ("d5", "d6", "no-match", 0.2)).toDF("a_id", "b_id", "bucket", "score")
      val links = graft.io.Links.toLinks(classified, runTs = 1723939200000L)
      graft.io.Links.writeJdbc(links, url, "links")
      val back = graft.io.Links.readJdbc(spark, url, "LINKS").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
      // no-match absent; pair orientation normalized to (min, max)
      assert(back === Set(("d1", "d2", "match", 0.97), ("d3", "d4", "maybe", 0.72)))

      // review tooling writes verdicts; they come back as LinkJob overrides
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        st.execute("CREATE TABLE verdicts (a_id VARCHAR(32), b_id VARCHAR(32), status VARCHAR(16))")
        st.execute("INSERT INTO verdicts VALUES ('d3', 'd4', 'VERIFIED'), ('d1', 'd2', 'retracted')")
        st.close()
      } finally conn.close()
      val ov = graft.io.Links.readOverrides(spark, url, "verdicts").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(ov === Set(("d3", "d4", "VERIFIED"), ("d1", "d2", "retracted")))
    } finally {
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftlinks;drop=true")
      catch { case _: java.sql.SQLException => }
    }
  }
}
