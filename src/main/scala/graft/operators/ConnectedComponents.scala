package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, by min-label
  * propagation with pointer jumping.
  *
  * Every iteration does two bounded steps, each a hash join + partial
  * aggregate on the current label table:
  *   1. neighbor step — every node lowers its label to the minimum label
  *      among its neighbors (classic label propagation, converges in
  *      O(diameter) rounds on its own);
  *   2. pointer jump — every node lowers its label to its LABEL's label
  *      (path halving), which collapses long chains exponentially, so
  *      the combined loop converges in O(log n) rounds even on a
  *      worst-case path graph. This is the same doubling idea as the
  *      small-star/large-star MapReduce formulation (Kiveris et al.,
  *      "Connected Components in MapReduce and Beyond", SoCC'14) in
  *      label-table form.
  *
  * Scale notes: no step materializes a neighborhood in one task — the
  * neighbor minimum is a partial-aggregated groupBy, the jump is an
  * equi-join on the label column, and each round's result is persisted
  * while the previous round is dropped, so lineage depth stays O(1)
  * per round (a 1000-executor run would swap the per-round persist for
  * a periodic checkpoint, same shape). Convergence is detected by
  * counting changed labels; labels decrease monotonically toward the
  * component minimum, so termination is guaranteed.
  */
object ConnectedComponents {

  /** @param edges two-column frame (src, dst) of undirected edges; any
    *              orderable-numeric node id type
    * @return (id, cluster_id): every node that appears in `edges`,
    *         labeled with the minimum node id of its component. The
    *         result is persisted (its lineage is the whole iterative
    *         chain, whose intermediates are dropped as the loop
    *         advances); every persist is registered with
    *         [[graft.CacheRegistry]] so `clear(session)` releases it.
    */
  def run(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val session = edges.sparkSession
    def tracked(df: DataFrame): DataFrame = graft.CacheRegistry.track(session, df)

    val e = edges.toDF("src", "dst")
    val bidir = tracked(e
      .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())

    // Each round feeds the label table into TWO joins (neighbor min +
    // pointer jump), so composing rounds naively nests the previous
    // round's Catalyst plan several times per iteration — exponential
    // plan growth even though persist() keeps execution linear. Every
    // round is therefore persisted AND plan-truncated (LogicalRDD over
    // its own cached rows), the no-write equivalent of the periodic
    // checkpoint a long-running cluster job would use.
    def flat(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftSqlBridge.truncateLineage(df)

    // initial label: min(self, direct neighbors)
    var persisted = tracked(bidir
      .groupBy("src")
      .agg(min(col("dst")).as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("lab")))
    var labels = flat(persisted)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // 1. neighbor step: min label over the neighborhood
      val nbrMin = bidir
        .join(labels, bidir("src") === labels("id"))
        .groupBy(bidir("dst").as("nid"))
        .agg(min(col("lab")).as("nlab"))
      // `prev` rides along so convergence detection below is a
      // filter-count on the round's own (already materialized) frame —
      // no extra join per round
      val stepped = labels
        .join(nbrMin, labels("id") === col("nid"), "left")
        .select(col("id"), col("lab").as("prev"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
      // 2. pointer jump: follow my label's label (labels are node ids,
      // so every label has a row in the table)
      val jump = stepped.select(col("id").as("jid"), col("lab").as("jlab"))
      val nextPersisted = tracked(stepped.alias("st")
        .join(jump, col("st.lab") === col("jid"), "left")
        .select(col("st.id").as("id"), col("st.prev").as("prev"),
          least(col("st.lab"), coalesce(col("jlab"), col("st.lab"))).as("lab")))
      val next = flat(nextPersisted)
      // the convergence count doubles as the action that materializes
      // this round's cache before the previous round is dropped
      changed = next.filter(col("lab") =!= col("prev")).count()
      persisted.unpersist() // superseded round; clear() tolerates the no-op
      persisted = nextPersisted
      labels = next.select("id", "lab")
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round $iter changed=$changed t=${System.nanoTime()}")
    }
    bidir.unpersist()
    labels.select(col("id"), col("lab").as("cluster_id"))
  }
}
