package graft

import org.apache.spark.sql.functions._
import graft.pipeline.PtimeAgg

/** knn_clustering composition (scarf/markers.py:323-439): profile
  * assembly, Paris module recovery, and the fix_cluster_order
  * argmax-median relabeling on fixtures with known module structure.
  */
class PtimeAggSpec extends SparkSpec {
  import spark.implicits._

  /** Three feature modules peaking early / mid / late in the bin axis.
    * Within a module the profiles are near-identical (tiny deterministic
    * jitter), across modules they are orthogonal bumps — Paris must
    * recover the partition exactly. Module sizes 6/4/3 are chosen so
    * Paris.cut's size-desc initial labels DISAGREE with pseudotime order:
    * the LATE module is the largest (would be cluster 1 by size), so the
    * argmax-median reorder must flip the labeling.
    */
  private def bump(center: Int, nBins: Int, jitter: Double): Seq[Double] =
    (1 to nBins).map(b => math.exp(-0.5 * math.pow(b - center, 2)) + jitter)

  lazy val profiles = {
    val nBins = 12
    val rows = for {
      (center, count, idBase) <- Seq((10, 6, 0L), (2, 4, 100L), (6, 3, 200L))
      i <- 0 until count
      (z, b) <- bump(center, nBins, 0.001 * i).zipWithIndex
    } yield (idBase + i, b + 1, z)
    rows.toDF("feat_id", "bin", "z_mean")
  }

  test("knnClustering recovers modules and orders them by argmax-bin median") {
    val out = PtimeAgg.knnClustering(profiles, k = 3, nClusters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // early-peaking module (features 100..103, argmax bin 2) must be 1,
    // mid (200..202, bin 6) must be 2, late (0..5, bin 10) must be 3 —
    // even though the late module is the largest (size-desc would rank it 1)
    (100L to 103L).foreach(f => assert(out(f) === 1L, s"feat $f"))
    (200L to 202L).foreach(f => assert(out(f) === 2L, s"feat $f"))
    (0L to 5L).foreach(f => assert(out(f) === 3L, s"feat $f"))
  }

  test("profile assembly is bin-ordered (not collect order)") {
    // shuffle the input row order; the profile must still sort by bin
    val shuffled = profiles.orderBy(md5(concat_ws(":", col("feat_id"), col("bin"))))
    val a = PtimeAgg.knnClustering(profiles, k = 3, nClusters = 3)
      .orderBy("feat_id").collect().toSeq
    val b = PtimeAgg.knnClustering(shuffled, k = 3, nClusters = 3)
      .orderBy("feat_id").collect().toSeq
    assert(a === b)
  }

  test("binnedProfiles matches the q56 shape: nBins rows per feature") {
    val coo = Seq((1L, 1L, 2.0), (2L, 1L, 4.0), (3L, 1L, 6.0), (4L, 1L, 8.0),
      (1L, 2L, 1.0), (3L, 2L, 3.0)).toDF("cell_id", "feat_id", "value")
    val ptime = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("cell_id", "ptime")
    val sel = Seq(1L, 2L).toDF("feat_id")
    val out = PtimeAgg.binnedProfiles(coo, ptime, sel, halfWidth = 1, nBins = 2)
    assert(out.count() === 4) // 2 features × 2 bins
    assert(out.groupBy("feat_id").count().select("count")
      .distinct().as[Long].head() === 2L)
  }

  test("end-to-end runPseudotimeAggregation labels every selected feature 1..C") {
    val coo = (1L to 40L).flatMap(c => (1L to 10L).map(f =>
      (c, f, ((c * f) % 7 + 1).toDouble))).toDF("cell_id", "feat_id", "value")
    val ptime = (1L to 40L).map(c => (c, c)).toDF("cell_id", "ptime")
    val sel = (1L to 10L).toDF("feat_id")
    val out = PtimeAgg.runPseudotimeAggregation(coo, ptime, sel,
      halfWidth = 2, nBins = 8, k = 3, nClusters = 3)
    assert(out.count() === 10)
    val cl = out.select("cluster").distinct().as[Long].collect().sorted
    assert(cl.head >= 1L && cl.last <= 3L)
  }
}
