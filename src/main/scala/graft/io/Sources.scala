package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.functions.clean_chain

/** Batch sources with Duke-style per-column cleaner chains applied on read —
  * the Spark analog of `[D datasources/CsvDataSource.java]` (SURVEY.md §2.1
  * S4/S5): a source yields cleaned Duke records, cleaning happens once at
  * ingest, declaratively (inside the scan's codegen stage), never per pair.
  */
object Sources {

  /** CSV with header -> DataFrame with the configured cleaner chains applied
    * to the named columns (other columns pass through untouched).
    */
  def csv(
      spark: SparkSession,
      path: String,
      cleaners: Map[String, Seq[String]] = Map.empty): DataFrame =
    withCleaners(spark.read.option("header", "true").csv(path), cleaners)

  /** JSON-lines source, same contract. */
  def jsonLines(
      spark: SparkSession,
      path: String,
      cleaners: Map[String, Seq[String]] = Map.empty): DataFrame =
    withCleaners(spark.read.json(path), cleaners)

  /** Parquet source, same contract (the sandbox's primary format). */
  def parquet(
      spark: SparkSession,
      path: String,
      cleaners: Map[String, Seq[String]] = Map.empty): DataFrame =
    withCleaners(spark.read.parquet(path), cleaners)

  /** JDBC source (Duke `[D datasources/JDBCDataSource.java]` analog): table or
    * pushdown subquery through Spark's JDBC reader, cleaner chains applied on
    * read. `partitionColumn`+bounds split the read into `numPartitions`
    * parallel range queries — without them a JDBC read is ONE task, the
    * classic single-connection funnel at scale. Tested offline against
    * embedded Derby (SourcesSpec).
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      table: String,
      cleaners: Map[String, Seq[String]] = Map.empty,
      properties: Map[String, String] = Map.empty,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = properties.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    val reader = partitionColumn match {
      case Some((colName, lower, upper, n)) => withProps
        .option("partitionColumn", colName)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
      case None => withProps
    }
    withCleaners(reader.load(), cleaners)
  }

  /** N-Triples source (Duke `[D datasources/NTriplesDataSource.java]` analog):
    * parses `<subj> <pred> obj .` lines (IRI or quoted-literal objects, with
    * `^^type` / `@lang` suffixes and standard escapes), keeps the mapped
    * predicates, and pivots to one row per subject — `doc_id` plus one
    * `array<string>` column per mapped predicate (Duke records are
    * multi-valued). Line parsing is a per-row pure function (`NTriples
    * .parseLine`, golden-tested); the pivot is a single hash aggregation on
    * subject. SparqlDataSource stays out of scope (needs a live endpoint —
    * SURVEY.md §2.1).
    *
    * `predicates`: full predicate IRI -> output column name.
    */
  def ntriples(
      spark: SparkSession,
      path: String,
      predicates: Map[String, String],
      cleaners: Map[String, Seq[String]] = Map.empty): DataFrame = {
    import spark.implicits._
    require(predicates.nonEmpty, "ntriples needs at least one mapped predicate")
    val parsed = spark.read.textFile(path)
      .flatMap(NTriples.parseLine)
      .toDF("subject", "predicate", "object")
    val wanted = predicates.keySet
    val aggs = predicates.toSeq.sortBy(_._2).map { case (iri, name) =>
      collect_list(when(col("predicate") === iri, col("object"))).as(name)
    }
    val pivoted = parsed
      .where(col("predicate").isInCollection(wanted))
      .groupBy(col("subject").as("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
    withCleaners(pivoted, cleaners)
  }

  private def withCleaners(df: DataFrame, cleaners: Map[String, Seq[String]]): DataFrame =
    cleaners.foldLeft(df) { case (acc, (column, chain)) =>
      val isArray = df.schema(column).dataType.typeName == "array"
      val cleaned: Column =
        if (isArray) transform(col(column), v => clean_chain(chain, v))
        else clean_chain(chain, col(column))
      acc.withColumn(column, cleaned)
    }
}

/** Pure N-Triples line parser (unit-testable without a session). Supports the
  * subset Duke consumes: IRI subjects/predicates, IRI or literal objects,
  * literal `^^<type>` / `@lang` suffixes, `\t \n \r \" \\ \uXXXX` escapes,
  * comment and blank lines.
  */
private[io] object NTriples {

  def parseLine(line0: String): Option[(String, String, String)] = {
    val line = line0.trim
    if (line.isEmpty || line.startsWith("#")) return None
    try {
      if (!line.startsWith("<")) return None
      val sEnd = line.indexOf('>')
      val subject = line.substring(1, sEnd)
      var i = skipWs(line, sEnd + 1)
      if (line.charAt(i) != '<') return None
      val pEnd = line.indexOf('>', i)
      val predicate = line.substring(i + 1, pEnd)
      i = skipWs(line, pEnd + 1)
      val obj = line.charAt(i) match {
        case '<' =>
          line.substring(i + 1, line.indexOf('>', i))
        case '"' =>
          // closing quote = first unescaped "
          var j = i + 1
          val sb = new StringBuilder
          while (line.charAt(j) != '"') {
            if (line.charAt(j) == '\\') {
              line.charAt(j + 1) match {
                case 't'  => sb.append('\t'); j += 2
                case 'n'  => sb.append('\n'); j += 2
                case 'r'  => sb.append('\r'); j += 2
                case '"'  => sb.append('"'); j += 2
                case '\\' => sb.append('\\'); j += 2
                case 'u' =>
                  sb.append(Integer.parseInt(line.substring(j + 2, j + 6), 16).toChar)
                  j += 6
                case c => sb.append(c); j += 2
              }
            } else { sb.append(line.charAt(j)); j += 1 }
          }
          sb.toString // ^^type / @lang suffixes ignored (Duke keeps the lexical value)
        case _ => return None // blank nodes out of the consumed subset
      }
      Some((subject, predicate, obj))
    } catch {
      case _: IndexOutOfBoundsException | _: NumberFormatException => None
    }
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }
}
