package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive clustering of match edges: the large-star/small-star
  * connected-components algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SOCC'14 — PAPERS.md), as iterative DataFrame joins
  * (SURVEY.md §2.7 G8). Mandated by BASELINE.json:6,14; the reference serves
  * pairwise scores only, Duke's LinkDatabase keeps pairwise links — transitive
  * closure is the scale-path addition.
  *
  * Determinism: cluster label = min doc_id of the component (lexicographic),
  * no `first()`-style nondeterminism (SURVEY.md §7.4).
  */
object Cluster {

  /** Result: (doc_id, cluster_id) for every node that appears in `edges`;
    * callers union in singletons (docs with no edge) with cluster_id = doc_id.
    */
  def connectedComponents(
      edges0: DataFrame,
      maxIter: Int = 50,
      onIteration: (Int, DataFrame) => DataFrame = (_, df) => df.localCheckpoint(true))
      : DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    var edges = edges0.select(
      least(col(edges0.columns(0)), col(edges0.columns(1))).as("a"),
      greatest(col(edges0.columns(0)), col(edges0.columns(1))).as("b"))
      .where($"a" =!= $"b").distinct()

    var converged = false
    var iter = 0
    var sig = signature(edges)
    while (!converged && iter < maxIter) {
      iter += 1
      val ls = largeStar(edges)
      val ss = smallStar(ls)
      // truncate lineage every iteration (iterative joins grow the plan
      // exponentially otherwise — SURVEY.md §4 "CC lineage explosion")
      edges = onIteration(iter, ss)
      val s2 = signature(edges)
      converged = s2 == sig
      sig = s2
    }
    require(converged, s"connected components did not converge in $maxIter iterations")

    // final edge set is a star forest (v -> component min); label every node
    val sym = edges.select($"a".as("n"), $"b".as("p"))
      .union(edges.select($"b".as("n"), $"a".as("p")))
    sym.groupBy($"n").agg(min($"p").as("mp"))
      .select($"n".as("doc_id"), least($"n", $"mp").as("cluster_id"))
  }

  /** large-star: for each node u, connect every strictly larger neighbor to
    * m(u) = min(N(u) ∪ {u}). Output may carry duplicate edges — the algorithm
    * is idempotent under multi-edges and small-star dedups right after, so we
    * skip a distinct here (one less shuffle per iteration).
    */
  private[pipeline] def largeStar(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select($"a".as("u"), $"b".as("v"))
      .union(edges.select($"b".as("u"), $"a".as("v")))
    val mins = sym.groupBy($"u").agg(min($"v").as("mv"))
      .select($"u", least($"u", $"mv").as("m"))
    sym.join(mins, "u")
      .where($"v" > $"u")
      .select(least($"v", $"m").as("a"), greatest($"v", $"m").as("b"))
      .where($"a" =!= $"b")
  }

  /** small-star: direct each edge large->small; for each node u connect all of
    * its smaller neighbors (and u itself) to m(u) = min neighbor. The single
    * distinct per iteration lives here.
    */
  private[pipeline] def smallStar(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val dir = edges.select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
      .where($"u" =!= $"v")
    val mins = dir.groupBy($"u").agg(min($"v").as("m"))
    val nbrs = dir.join(mins, "u").where($"v" =!= $"m")
      .select($"v".as("a"), $"m".as("b"))
    val self = mins.select($"u".as("a"), $"m".as("b"))
    nbrs.union(self).where($"a" =!= $"b")
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .distinct()
  }

  /** Cheap fixed-point signature: (|E|, sum of row hashes) — order-independent. */
  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      count("*").as("n"),
      coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("h")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }
}
