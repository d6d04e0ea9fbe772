package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.functions._
import graft.model.MatchConfig
import graft.pipeline.{Cluster, ErPipeline, Fixtures}

/** Driver contract (SURVEY.md §7.5): one `queries` entry per implemented
  * operator from SURVEY.md §2, with a DuckDB-runnable oracle where the
  * semantics are ANSI-SQL-expressible.
  *
  * Oracle-parity conventions (established against DuckDB v1.0.0 in-session):
  *  - doubles never leave a query raw: `micro(x)` = floor(x*1e6 + 0.5) as
  *    BIGINT on BOTH sides (identical double expression trees -> identical
  *    bits -> identical integers; no engine rounding-mode dependence);
  *  - money sums round per row to integer cents, then sum exactly;
  *  - Jaro-Winkler: DuckDB applies the 0.7 boost threshold, our Duke-parity
  *    comparator does not — JW oracles filter to jaro > 0.7 where both agree
  *    bit-for-bit (verified on golden pairs);
  *  - q-gram / token comparators use SET semantics (mirrors Duke's HashSet
  *    grams) so DuckDB list_distinct/list_intersect reproduce them.
  */
object SparkEntry {

  private def micro(c: Column): Column = floor(c * 1e6 + 0.5).cast("long")
  private val microSql = (e: String) => s"CAST(FLOOR(($e) * 1e6 + 0.5) AS BIGINT)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** supplier x customer within the same nation — the standing pair set used by
    * comparator demos (~6k pairs at sf0.01). Blocking key = nationkey (P2/J2).
    */
  private def pairSet(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      .join(
        t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal")),
        col("c_nationkey") === col("s_nationkey"))

  private val pairSetSql =
    """FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey"""

  /** Flagship: the full ER pipeline (extract -> block -> salted self-join ->
    * mapPartitions scoring -> CC) on the deterministic interleaved fixture.
    */
  def entry(spark: SparkSession): DataFrame = {
    val config = MatchConfig.fixture
    val docs = Fixtures.docs(spark, 300)
    val records = ErPipeline.extract(docs, config)
    val (pairIds, _) = ErPipeline.pairs(ErPipeline.block(records))
    val scored = ErPipeline.score(pairIds, records, config)
    val edges = ErPipeline.matchEdges(scored, config)
    Cluster.connectedComponents(edges)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---------------- cleaners (C1-C3, SURVEY.md §2.3) ----------------
    "q_cleaner_chain" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        clean_chain(Seq("trim", "lowercase-normalize"), col("c_name")).as("norm_name"))
    }),
    "q_cleaner_digits" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        clean("digits-only", col("c_name")).as("digits"))
    }),

    // ---------------- comparators over the pair set (K1-K9, §2.4) ----------------
    "q_pair_levenshtein" -> ((s, dir) => {
      pairSet(s, dir).select(
        col("c_custkey"), col("s_suppkey"),
        levenshtein(col("c_name"), col("s_name")).cast("long").as("dist"),
        micro(sim_levenshtein(col("c_name"), col("s_name"))).as("sim_micro"))
    }),
    "q_pair_jaro_winkler" -> ((s, dir) => {
      pairSet(s, dir)
        .where(sim_jaro(col("c_name"), col("s_name")) > 0.7)
        .select(
          col("c_custkey"), col("s_suppkey"),
          micro(sim_jaro_winkler(col("c_name"), col("s_name"))).as("jw_micro"))
    }),
    "q_pair_qgram_dice" -> ((s, dir) => {
      pairSet(s, dir).select(
        col("c_custkey"), col("s_suppkey"),
        micro(sim_qgram(col("c_name"), col("s_name"), q = 2, formula = 1)).as("dice_micro"))
    }),
    "q_pair_token_sets" -> ((s, dir) => {
      val a = clean_chain(Seq("lowercase-normalize"), col("c_name"))
      val b = clean_chain(Seq("lowercase-normalize"), col("s_name"))
      pairSet(s, dir).select(
        col("c_custkey"), col("s_suppkey"),
        micro(sim_dice(a, b)).as("dice_micro"),
        micro(sim_jaccard(a, b)).as("jaccard_micro"))
    }),
    "q_pair_numeric" -> ((s, dir) => {
      pairSet(s, dir).select(
        col("c_custkey"), col("s_suppkey"),
        micro(sim_numeric(col("c_acctbal").cast("string"), col("s_acctbal").cast("string")))
          .as("num_micro"))
    }),

    // ---------------- Duke scoring fold in oracle-checkable form (A1+A3+P4, §2.5) ----------------
    "q_duke_score" -> ((s, dir) => {
      val p1 = duke_probability(sim_levenshtein(col("c_name"), col("s_name")), 0.2, 0.9)
      val p2 = duke_probability(
        sim_numeric(col("c_acctbal").cast("string"), col("s_acctbal").cast("string")), 0.3, 0.8)
      val score = bayes_combine(bayes_combine(lit(0.5), p1), p2)
      pairSet(s, dir).select(
        col("c_custkey"), col("s_suppkey"),
        micro(score).as("score_micro"),
        when(score >= 0.8, "match").when(score >= 0.6, "maybe").otherwise("no-match").as("bucket"))
    }),

    // ---------------- blocking + self-join (J1/J3, §2.6) ----------------
    "q_block_prefix_keys" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(substring(clean("lowercase-normalize", col("c_name")), 1, 10).as("block_key"))
        .agg(count("*").as("n_docs"))
    }),
    "q_selfjoin_pairs_per_block" -> ((s, dir) => {
      val su = t(s, dir, "supplier")
      val a = su.select(col("s_suppkey").as("a_id"), col("s_nationkey").as("k"))
      val b = su.select(col("s_suppkey").as("b_id"), col("s_nationkey").as("k"))
      a.join(b, "k").where(col("a_id") < col("b_id"))
        .groupBy(col("k").as("nationkey")).agg(count("*").as("n_pairs"))
    }),
    "q_salted_block_counts" -> ((s, dir) => {
      // deterministic salt (orderkey mod 4): the skew-splitting pattern in an
      // oracle-checkable form (production path uses xxhash64 salts)
      t(s, dir, "orders")
        .groupBy(col("o_custkey"), pmod(col("o_orderkey"), lit(4)).as("salt"))
        .agg(count("*").as("n"))
    }),

    // ---------------- top-k / best-match / windows (G1, G2, G6, §2.7) ----------------
    "q_topk_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk").cast("long").as("rk"))
    }),
    "q_best_match" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val jw = micro(sim_jaro_winkler(col("c_name"), col("s_name")))
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("jw_micro").desc, col("s_suppkey"))
      pairSet(s, dir)
        .where(sim_jaro(col("c_name"), col("s_name")) > 0.7)
        .select(col("c_custkey"), col("s_suppkey"), jw.as("jw_micro"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("c_custkey"), col("s_suppkey"), col("jw_micro"))
    }),
    "q_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "lineitem")
        .withColumn("qty_cents", floor(col("l_quantity") * 100 + 0.5).cast("long"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("qty_cents")).over(w).as("running_qty_cents"))
    }),

    // ---------------- aggregation (G3/G4, §2.7) ----------------
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("sum_qty_cents"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
            .cast("long")).as("revenue_cents"),
          count("*").as("n"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // ---------------- connected components (G8, §2.7) ----------------
    "q_cc_order_chains" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // chain consecutive orders of each customer -> components = customers
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val ranked = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
      val a = ranked.select(col("o_custkey"), col("o_orderkey").as("a"), col("rn"))
      val b = ranked.select(col("o_custkey"), col("o_orderkey").as("b"), (col("rn") - 1).as("rn"))
      val edges = a.join(b, Seq("o_custkey", "rn")).select(col("a"), col("b"))
      Cluster.connectedComponents(edges)
        .select(col("doc_id").as("o_orderkey"), col("cluster_id"))
    }),

    // ---------------- dedup: exact (training-data ops) ----------------
    "q_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_md5"))
        .agg(count("*").as("n"), min(col("doc_id")).as("keep_id"))
        .where(col("n") >= 1)
    }))

  def oracleSql: Map[String, String] = Map(
    "q_cleaner_chain" ->
      """SELECT c_custkey,
        |       trim(regexp_replace(lower(strip_accents(trim(c_name))), '[^a-z0-9]+', ' ', 'g')) AS norm_name
        |FROM customer""".stripMargin,
    "q_cleaner_digits" ->
      """SELECT c_custkey, regexp_replace(c_name, '[^0-9]', '', 'g') AS digits
        |FROM customer""".stripMargin,
    "q_pair_levenshtein" -> {
      val lo = "LEAST(length(c_name), length(s_name))"
      val hi = "GREATEST(length(c_name), length(s_name))"
      s"""SELECT c_custkey, s_suppkey,
         |       levenshtein(c_name, s_name) AS dist,
         |       ${microSql(
        s"CASE WHEN $hi = 0 THEN 1.0 WHEN CAST($lo AS DOUBLE) / CAST($hi AS DOUBLE) <= 0.5 THEN 0.0 " +
          s"ELSE 1.0 - CAST(LEAST(levenshtein(c_name, s_name), $lo) AS DOUBLE) / CAST($lo AS DOUBLE) END")} AS sim_micro
         |$pairSetSql""".stripMargin
    },
    "q_pair_jaro_winkler" ->
      s"""SELECT c_custkey, s_suppkey,
         |       ${microSql("jaro_winkler_similarity(c_name, s_name)")} AS jw_micro
         |$pairSetSql
         |WHERE jaro_similarity(c_name, s_name) > 0.7""".stripMargin,
    "q_pair_qgram_dice" -> {
      def grams(c: String) =
        s"list_distinct(list_transform(generate_series(1, length($c)-1), i -> substr($c, i, 2)))"
      s"""SELECT c_custkey, s_suppkey,
         |  ${microSql(
        s"CASE WHEN c_name = s_name THEN 1.0 " +
          s"WHEN length(c_name) < 2 OR length(s_name) < 2 THEN 0.0 " +
          s"ELSE 2.0 * len(list_intersect(${grams("c_name")}, ${grams("s_name")})) " +
          s"/ (len(${grams("c_name")}) + len(${grams("s_name")})) END")} AS dice_micro
         |$pairSetSql""".stripMargin
    },
    "q_pair_token_sets" -> {
      def toks(c: String) =
        s"list_distinct(list_filter(string_split(trim(regexp_replace(lower(strip_accents(trim($c))), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> ''))"
      val (ta, tb) = (toks("c_name"), toks("s_name"))
      val norm = (c: String) => s"trim(regexp_replace(lower(strip_accents(trim($c))), '[^a-z0-9]+', ' ', 'g'))"
      s"""SELECT c_custkey, s_suppkey,
         |  ${microSql(
        s"CASE WHEN ${norm("c_name")} = ${norm("s_name")} THEN 1.0 " +
          s"WHEN len($ta) = 0 OR len($tb) = 0 THEN 0.0 " +
          s"ELSE 2.0 * len(list_intersect($ta, $tb)) / (len($ta) + len($tb)) END")} AS dice_micro,
         |  ${microSql(
        s"CASE WHEN ${norm("c_name")} = ${norm("s_name")} THEN 1.0 " +
          s"WHEN len($ta) = 0 OR len($tb) = 0 THEN 0.0 " +
          s"ELSE CAST(len(list_intersect($ta, $tb)) AS DOUBLE) " +
          s"/ (len($ta) + len($tb) - len(list_intersect($ta, $tb))) END")} AS jaccard_micro
         |$pairSetSql""".stripMargin
    },
    "q_pair_numeric" -> {
      val sim = "CASE WHEN c_acctbal = s_acctbal THEN 1.0 " +
        "WHEN c_acctbal <= 0 OR s_acctbal <= 0 THEN 0.0 " +
        "ELSE LEAST(c_acctbal, s_acctbal) / GREATEST(c_acctbal, s_acctbal) END"
      s"""SELECT c_custkey, s_suppkey, ${microSql(sim)} AS num_micro
         |$pairSetSql""".stripMargin
    },
    "q_duke_score" -> {
      val lo = "LEAST(length(c_name), length(s_name))"
      val hi = "GREATEST(length(c_name), length(s_name))"
      val sim1 = s"CASE WHEN $hi = 0 THEN 1.0 WHEN CAST($lo AS DOUBLE) / CAST($hi AS DOUBLE) <= 0.5 THEN 0.0 " +
        s"ELSE 1.0 - CAST(LEAST(levenshtein(c_name, s_name), $lo) AS DOUBLE) / CAST($lo AS DOUBLE) END"
      val sim2 = "CASE WHEN c_acctbal = s_acctbal THEN 1.0 " +
        "WHEN c_acctbal <= 0 OR s_acctbal <= 0 THEN 0.0 " +
        "ELSE LEAST(c_acctbal, s_acctbal) / GREATEST(c_acctbal, s_acctbal) END"
      val p1 = s"CASE WHEN ($sim1) >= 0.5 THEN (0.9 - 0.5) * ($sim1) * ($sim1) + 0.5 ELSE 0.2 END"
      val p2 = s"CASE WHEN ($sim2) >= 0.5 THEN (0.8 - 0.5) * ($sim2) * ($sim2) + 0.5 ELSE 0.3 END"
      val b1 = s"(0.5 * ($p1)) / (0.5 * ($p1) + (1.0 - 0.5) * (1.0 - ($p1)))"
      val score = s"(($b1) * ($p2)) / (($b1) * ($p2) + (1.0 - ($b1)) * (1.0 - ($p2)))"
      s"""SELECT c_custkey, s_suppkey, ${microSql(score)} AS score_micro,
         |  CASE WHEN ($score) >= 0.8 THEN 'match' WHEN ($score) >= 0.6 THEN 'maybe'
         |       ELSE 'no-match' END AS bucket
         |$pairSetSql""".stripMargin
    },
    "q_block_prefix_keys" ->
      """SELECT substr(trim(regexp_replace(lower(strip_accents(trim(c_name))), '[^a-z0-9]+', ' ', 'g')), 1, 10) AS block_key,
        |       count(*) AS n_docs
        |FROM customer GROUP BY 1""".stripMargin,
    "q_selfjoin_pairs_per_block" ->
      """SELECT a.s_nationkey AS nationkey, count(*) AS n_pairs
        |FROM supplier a JOIN supplier b
        |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
        |GROUP BY 1""".stripMargin,
    "q_salted_block_counts" ->
      """SELECT o_custkey, o_orderkey % 4 AS salt, count(*) AS n
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q_best_match" ->
      s"""SELECT c_custkey, s_suppkey, jw_micro FROM (
         |  SELECT c_custkey, s_suppkey,
         |         ${microSql("jaro_winkler_similarity(c_name, s_name)")} AS jw_micro,
         |         row_number() OVER (PARTITION BY c_custkey
         |             ORDER BY ${microSql("jaro_winkler_similarity(c_name, s_name)")} DESC,
         |                      s_suppkey) AS rk
         |  $pairSetSql
         |  WHERE jaro_similarity(c_name, s_name) > 0.7)
         |WHERE rk = 1""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       CAST(sum(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
        |         OVER (PARTITION BY l_suppkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty_cents
        |FROM lineitem""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |       CAST(sum(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_cc_order_chains" ->
      """SELECT o_orderkey,
        |       min(o_orderkey) OVER (PARTITION BY o_custkey) AS cluster_id
        |FROM orders
        |WHERE o_custkey IN (SELECT o_custkey FROM orders GROUP BY 1 HAVING count(*) >= 2)""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_md5, count(*) AS n, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin)
}
