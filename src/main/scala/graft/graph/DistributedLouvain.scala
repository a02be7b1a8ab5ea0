package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Lineage

/** Distributed one-level Louvain (SURVEY.md §2.11 scale-up path for
  * Cluster.louvain): every node iteratively moves to the neighboring
  * community with the best modularity gain, computed entirely with
  * joins/aggregations — no driver-side graph.
  *
  * Synchronous updates can oscillate (two nodes swapping into each
  * other's communities forever), so moves alternate by node parity —
  * even-hash nodes move on even rounds, odd on odd — the standard
  * damping for synchronous label optimization. Labels converge to a
  * local modularity optimum; exact agreement with sequential Louvain is
  * not guaranteed (same caveat as distributed Leiden implementations).
  *
  * Input: directed edge list `(src, dst, weight)`; treated as
  * undirected by symmetrization.
  */
object DistributedLouvain {

  def cluster(edges: DataFrame, rounds: Int = 8): DataFrame = {
    val sym = edges.select(col("src"), col("dst"), col("weight"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(max(col("weight")).as("weight"))
    val symCk = Lineage.reset(sym)

    val deg = symCk.groupBy("src").agg(sum(col("weight")).as("deg"))
    val m2Row = deg.agg(sum(col("deg")).as("m2"))
    val degCk = Lineage.reset(deg.crossJoin(broadcast(m2Row)))

    // community = own node initially
    var comm = degCk.select(col("src").as("node"), col("src").as("comm"))

    for (round <- 0 until rounds) {
      // community volumes (sum of member degrees)
      val vol = comm.join(degCk.withColumnRenamed("src", "node"), Seq("node"))
        .groupBy("comm").agg(sum(col("deg")).as("vol"))
      // per (node, neighboring community): total edge weight into it;
      // the node's OWN community is always a candidate (w_in may be 0)
      // so "stay" competes fairly
      val nbrComm = symCk
        .join(comm.withColumnRenamed("node", "dst").withColumnRenamed("comm", "c_dst"), Seq("dst"))
        .select(col("src").as("node"), col("c_dst").as("cand"), col("weight"))
      val ownComm = comm.select(col("node"), col("comm").as("cand"), lit(0.0).as("weight"))
      val toComm = nbrComm.unionByName(ownComm)
        .groupBy("node", "cand").agg(sum(col("weight")).as("w_in"))
      // modularity gain with the node removed from its own community's
      // volume (the standard Louvain correction — without it, smaller
      // communities always look better and synchronous moves oscillate)
      val scored = toComm
        .join(vol.withColumnRenamed("comm", "cand"), Seq("cand"))
        .join(degCk.withColumnRenamed("src", "node"), Seq("node"))
        .join(comm, Seq("node"))
        .withColumn("vol_adj",
          when(col("cand") === col("comm"), col("vol") - col("deg")).otherwise(col("vol")))
        .withColumn("gain", col("w_in") - col("deg") * col("vol_adj") / col("m2"))
      val best = scored
        .withColumn("rn", row_number().over(Window.partitionBy("node")
          .orderBy(col("gain").desc, col("cand"))))
        .filter(col("rn") === 1)
        .select(col("node"), col("cand"))
      // parity damping: only half the nodes move each round
      comm = Lineage.reset(
        comm.join(best, Seq("node"), "left")
          .select(col("node"),
            when(pmod(hash(col("node")), lit(2)) === round % 2,
              coalesce(col("cand"), col("comm"))).otherwise(col("comm")).as("comm")))
    }
    // relabel to dense 1..C by size desc
    val sizes = comm.groupBy("comm").agg(count(lit(1)).as("sz"))
    val relabel = graft.ops.Windows.globalOrdinal(
        sizes, Seq(col("sz").desc, col("comm")), "cluster")
      .select("comm", "cluster")
    comm.join(broadcast(relabel), Seq("comm"))
      .select(col("node").as("cell_id"), col("cluster"))
  }

  /** Distributed Leiden-style refinement: split every community into its
    * connected components (the guarantee Leiden adds over Louvain —
    * Traag 2019 Thm. 1 gives connectivity, not optimality). Min-label
    * propagation restricted to same-community edges, iterated UNTIL
    * CONVERGENCE (no label changed) with `maxRounds` as a safety cap —
    * a fixed round count would wrongly split connected communities whose
    * diameter exceeds it (e.g. path-shaped trajectory clusters).
    * All-DataFrame, no driver graph. Schema: `(cell_id, cluster)`.
    */
  def refine(edges: DataFrame, labels: DataFrame, maxRounds: Int = 64): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val lab = labels.select(col("cell_id").as("node"), col("cluster").as("comm"))
    // same-community edges only
    val within = Lineage.reset(sym
      .join(lab.withColumnRenamed("node", "src").withColumnRenamed("comm", "c_src"), Seq("src"))
      .join(lab.withColumnRenamed("node", "dst").withColumnRenamed("comm", "c_dst"), Seq("dst"))
      .filter(col("c_src") === col("c_dst"))
      .select("src", "dst"))
    var sub = lab.select(col("node"), col("comm"), col("node").as("sub"))
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val nbrMin = within
        .join(sub.withColumnRenamed("node", "dst").drop("comm")
          .withColumnRenamed("sub", "nb_sub"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("nb_sub")).as("nb_min"))
      val next = Lineage.reset(sub.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("comm"), col("sub").as("sub_prev"),
          least(col("sub"), coalesce(col("nb_min"), col("sub"))).as("sub")))
      changed = next.filter(col("sub") =!= col("sub_prev")).count()
      sub = next.drop("sub_prev")
      round += 1
    }
    val sizes = sub.groupBy("comm", "sub").agg(count(lit(1)).as("sz"))
    val relabel = graft.ops.Windows.globalOrdinal(
        sizes, Seq(col("sz").desc, col("comm"), col("sub")), "cluster")
      .select("comm", "sub", "cluster")
    sub.join(broadcast(relabel), Seq("comm", "sub"))
      .select(col("node").as("cell_id"), col("cluster"))
  }
}
