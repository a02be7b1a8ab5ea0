package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UMAP-style 2-D layout (SURVEY.md §2.11). Like the reference — which
  * hands umap-learn's SGD a CSR graph built in-process
  * (scarf/umap.py:41-164) — the optimization runs on the driver over the
  * collected edge list (n·k edges; the per-cell state is 2 doubles).
  * Graph prep (symmetrize, weights) is distributed; only the O(n·k) SGD
  * is driver-side, with a seeded deterministic schedule.
  *
  * Curve params (a, b) default to UMAP's fitted values for
  * min_dist = 0.1, spread = 1.0.
  */
object UmapLayout {

  def layout(edges: DataFrame, init: DataFrame, nEpochs: Int = 50,
             a: Double = 1.576943, b: Double = 0.895061,
             learningRate: Double = 1.0, negSamples: Int = 5,
             seed: Long = 4444L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val es = edges.select("src", "dst", "weight").as[(Long, Long, Double)].collect()
    val coords = scala.collection.mutable.Map[Long, Array[Double]]()
    init.select("cell_id", "x", "y").as[(Long, Double, Double)].collect()
      .foreach { case (id, x, y) => coords(id) = Array(x, y) }
    es.foreach { case (s, d, _) =>
      coords.getOrElseUpdate(s, Array(0.0, 0.0))
      coords.getOrElseUpdate(d, Array(0.0, 0.0))
    }
    val ids = coords.keys.toArray.sorted
    val rnd = new scala.util.Random(seed)
    val wMax = es.map(_._3).foldLeft(1e-12)(math.max)

    def clip(x: Double): Double = math.max(-4.0, math.min(4.0, x))

    var epoch = 0
    while (epoch < nEpochs) {
      val alpha = learningRate * (1.0 - epoch.toDouble / nEpochs)
      es.foreach { case (s, d, w) =>
        if (rnd.nextDouble() < w / wMax) {
          val cs = coords(s); val cd = coords(d)
          val d2 = {
            val dx = cs(0) - cd(0); val dy = cs(1) - cd(1); dx * dx + dy * dy
          }
          // attractive gradient of the (a, b) curve
          val gradCo = if (d2 > 0) (-2.0 * a * b * math.pow(d2, b - 1)) /
            (1.0 + a * math.pow(d2, b)) else 0.0
          var i = 0
          while (i < 2) {
            val g = clip(gradCo * (cs(i) - cd(i)))
            cs(i) += alpha * g
            cd(i) -= alpha * g
            i += 1
          }
          // negative sampling: repulse from random nodes
          var ns = 0
          while (ns < negSamples) {
            val other = coords(ids(rnd.nextInt(ids.length)))
            val r2 = {
              val dx = cs(0) - other(0); val dy = cs(1) - other(1); dx * dx + dy * dy
            }
            val rep = (2.0 * b) / ((0.001 + r2) * (1.0 + a * math.pow(r2, b)))
            var j = 0
            while (j < 2) {
              cs(j) += alpha * clip(rep * (cs(j) - other(j)))
              j += 1
            }
            ns += 1
          }
        }
      }
      epoch += 1
    }
    ids.map(id => (id, coords(id)(0), coords(id)(1)))
      .toSeq.toDF("cell_id", "umap1", "umap2")
  }

  /** PCA-based init (reference seeds layouts from reduced space,
    * _get_ini_embed, scarf/datastore/graph_datastore.py:427-457): first
    * two latent components, rescaled to ~[-10, 10].
    */
  def initFromLatent(latent: DataFrame): DataFrame = {
    val xy = latent.select(col("cell_id"),
      element_at(col("latent"), 1).as("x0"),
      element_at(col("latent"), 2).as("y0"))
    val stats = xy.agg(
      max(abs(col("x0"))).as("mx"), max(abs(col("y0"))).as("my"))
    xy.crossJoin(broadcast(stats))
      .select(col("cell_id"),
        (col("x0") / col("mx") * 10).as("x"),
        (col("y0") / col("my") * 10).as("y"))
  }
}
