package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopACeDo-style cell sketching (run_topacedo_sampler,
  * scarf/datastore/graph_datastore.py:1586-1727). The reference delegates
  * to the external `topacedo` package (as it does for tSNE); this is the
  * in-engine equivalent of its documented behavior: per-cluster sampling
  * rates modulated down by neighbourhood density and up for low-SNN
  * (loosely knit) clusters, clamped to [minRate, maxRate] with a
  * min-cells floor; seeded deterministic draws; plus connector cells
  * (neighbors bridging ≥ 2 seeds) standing in for the package's
  * prize-collecting Steiner tree pass. All joins/aggregations.
  */
object Sketch {

  /** Neighbourhood density (calc_neighbourhood_density): node degree,
    * then `depth` rounds of summing neighbours' values — depth 0 = own
    * degree, depth d = degree mass reachable in d hops.
    */
  def neighbourhoodDensity(edges: DataFrame, depth: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var dens = sym.groupBy("src").agg(count(lit(1)).cast("double").as("density"))
      .withColumnRenamed("src", "cell_id")
    for (_ <- 1 to depth) {
      dens = graft.core.Lineage.reset(
        sym.join(dens.withColumnRenamed("cell_id", "dst"), Seq("dst"))
          .groupBy(col("src").as("cell_id"))
          .agg(sum(col("density")).as("density")))
    }
    dens
  }

  /** Sketch the dataset: returns `(cell_id, is_seed, sketched)`.
    * `clusters(cell_id, cluster)`; `edges` = the KNN graph.
    */
  def topacedo(edges: DataFrame, clusters: DataFrame,
               maxRate: Double = 0.05, minRate: Double = 0.01,
               minCellsPerGroup: Int = 3, densityDepth: Int = 2,
               densityBandwidth: Double = 5.0, snnBandwidth: Double = 5.0,
               seed: Long = 4466L): DataFrame = {
    val dens = neighbourhoodDensity(edges, densityDepth)
    // per-cluster mean density, min-max normalized across clusters
    val cdens = clusters.join(dens, Seq("cell_id"), "left")
      .na.fill(0.0, Seq("density"))
      .groupBy("cluster").agg(avg("density").as("mean_density"),
        count(lit(1)).as("sz"))
    val bounds = cdens.agg(min("mean_density").as("lo"), max("mean_density").as("hi"))
    // per-cluster mean SNN consistency from the KNN neighbour lists
    val snn = GraphOps.snn(edges.select("src", "dst"), 1)
    val snnNorm = snn.agg(max("shared").as("snn_max"))
    val csnn = clusters.join(
        snn.select(col("i").as("cell_id"), col("shared"))
          .unionByName(snn.select(col("j").as("cell_id"), col("shared")))
          .groupBy("cell_id").agg(avg("shared").as("cell_snn")),
        Seq("cell_id"), "left")
      .na.fill(0.0, Seq("cell_snn"))
      .groupBy("cluster").agg(avg("cell_snn").as("mean_snn"))
    val rates = cdens.crossJoin(broadcast(bounds))
      .join(csnn, Seq("cluster"))
      .crossJoin(broadcast(snnNorm))
      .withColumn("dnorm",
        when(col("hi") > col("lo"),
          (col("mean_density") - col("lo")) / (col("hi") - col("lo"))).otherwise(0.0))
      .withColumn("snorm", col("mean_snn") / greatest(col("snn_max").cast("double"), lit(1.0)))
      // dense neighbourhoods → fewer samples; high-SNN (tightly knit)
      // clusters → fewer samples (their structure is redundant)
      .withColumn("rate", greatest(lit(minRate), least(lit(maxRate),
        lit(maxRate) * pow(lit(densityBandwidth), -col("dnorm"))
          * pow(lit(snnBandwidth), -col("snorm")))))
      .withColumn("n_take", greatest(lit(minCellsPerGroup),
        ceil(col("rate") * col("sz"))).cast("int"))
      .select("cluster", "rate", "n_take")
    // seeded deterministic per-cluster draw
    val ranked = clusters.join(broadcast(rates), Seq("cluster"))
      .withColumn("rn", row_number().over(Window.partitionBy("cluster")
        .orderBy(md5(concat(lit(s"$seed:"), col("cell_id"))), col("cell_id"))))
    val seeds = ranked.filter(col("rn") <= col("n_take"))
      .select(col("cell_id"), col("cluster"))
    // connector pass (PCST stand-in): a non-seed adjacent to >= 2 seeds of
    // its own cluster joins the sketch to keep seed neighbourhoods linked
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val connectors = sym
      .join(seeds.withColumnRenamed("cell_id", "dst"), Seq("dst"))
      .join(clusters.withColumnRenamed("cell_id", "src")
        .withColumnRenamed("cluster", "c_src"), Seq("src"))
      .filter(col("cluster") === col("c_src"))
      .groupBy(col("src").as("cell_id")).agg(countDistinct(col("dst")).as("n_seed_nbrs"))
      .filter(col("n_seed_nbrs") >= 2)
      .join(seeds.select(col("cell_id")), Seq("cell_id"), "left_anti")
      .select("cell_id")
    clusters.select("cell_id")
      .join(seeds.select(col("cell_id"), lit(true).as("is_seed")), Seq("cell_id"), "left")
      .join(connectors.withColumn("is_conn", lit(true)), Seq("cell_id"), "left")
      .select(col("cell_id"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"),
        (coalesce(col("is_seed"), lit(false)) || coalesce(col("is_conn"), lit(false)))
          .as("sketched"))
  }
}
