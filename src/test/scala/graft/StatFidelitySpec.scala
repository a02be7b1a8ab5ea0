package graft

import org.apache.spark.sql.functions._
import graft.stats.{HtoDemux, Lowess, Pseudobulk}

/** Statistical-fidelity operators: LOWESS trend, NB-MLE HTO cutoff,
  * seeded binned sampling, make_bulk pseudo-reps (scarf/feat_utils.py,
  * scarf/datastore/datastore.py:1016-1022).
  */
class StatFidelitySpec extends SparkSpec {

  test("lowess reproduces a line exactly (local linear fit is exact on collinear data)") {
    val xs = Array.tabulate(50)(i => i / 5.0)
    val ys = xs.map(x => 3.0 * x - 1.0)
    val f = Lowess.fit(xs, ys, frac = 0.4, iters = 3)
    xs.indices.foreach(i => assert(approx(f(i), ys(i), 1e-9)))
  }

  test("lowess smooths an outlier away under robust iterations") {
    val xs = Array.tabulate(41)(i => i / 4.0)
    // realistic noisy line — robustness acts on noisy data, where the
    // median residual scale is meaningful
    val ys = xs.zipWithIndex.map { case (x, i) => 2.0 * x + 0.4 * math.sin(13.7 * i) }
    ys(20) = 1000.0 // gross outlier
    val f = Lowess.fit(xs, ys, frac = 0.5, iters = 10)
    // robust bisquare weighting must pull the fit at the outlier back to
    // the underlying line
    assert(math.abs(f(20) - 2.0 * xs(20)) < 1.0, s"fit at outlier = ${f(20)}")
  }

  test("lowess corrected variance flattens a log-linear mean-variance trend") {
    import spark.implicits._
    // sigmas = avg^1.7 exactly -> log-log linear -> corrected ratio ~const
    val stats = (1 to 200).map { i =>
      val a = 0.1 * i
      (i.toLong, a, math.pow(a, 1.7))
    }.toDF("feat_id", "avg", "sigmas")
    val c = graft.stats.Lowess.correctedVar(stats, nBins = 10, frac = 0.6)
      .collect().map(_.getDouble(1))
    // all corrected values positive and within a modest band (trend removed)
    assert(c.forall(_ > 0))
    val ratio = c.max / c.min
    assert(ratio < 20, s"corrected spread $ratio — trend not removed")
  }

  test("nbCutoff separates NB-ish background from signal and respects loc shift") {
    // Geometric-ish background: many small counts
    val bg = Array.fill(200)(0.0) ++ Array.fill(150)(1.0) ++ Array.fill(100)(2.0) ++
      Array.fill(50)(3.0) ++ Array.fill(20)(5.0) ++ Array.fill(5)(8.0)
    val cut = HtoDemux.nbCutoff(bg, 0.99)
    // mean ≈ 1.06; cutoff = round(mu + ppf0) must clear the background bulk
    // but stay far below a strong signal (~100)
    assert(cut >= 3 && cut <= 30, s"cutoff $cut out of plausible band")
  }

  test("lgamma matches known values") {
    assert(approx(HtoDemux.lgamma(1.0), 0.0, 1e-10))
    assert(approx(HtoDemux.lgamma(5.0), math.log(24.0), 1e-10))
    assert(approx(HtoDemux.lgamma(0.5), 0.5 * math.log(math.Pi), 1e-10))
  }

  test("hto demux classifies planted singlets, doublets and negatives") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def bgCount() = rnd.nextInt(3).toDouble
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
    (0L until 60L).foreach { c => // HTO1 singlets
      rows += ((c, "HTO1", 120.0 + rnd.nextInt(20))); rows += ((c, "HTO2", bgCount()))
    }
    (60L until 120L).foreach { c => // HTO2 singlets
      rows += ((c, "HTO1", bgCount())); rows += ((c, "HTO2", 140.0 + rnd.nextInt(20)))
    }
    (120L until 140L).foreach { c => // doublets
      rows += ((c, "HTO1", 130.0)); rows += ((c, "HTO2", 150.0))
    }
    (140L until 170L).foreach { c => // negatives
      rows += ((c, "HTO1", bgCount())); rows += ((c, "HTO2", bgCount()))
    }
    val counts = rows.toSeq.toDF("cell_id", "hto", "count")
    val calls = HtoDemux.demux(counts).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 60L).forall(calls(_) == "HTO1"))
    assert((60L until 120L).forall(calls(_) == "HTO2"))
    assert((120L until 140L).forall(calls(_) == "Doublet"))
    assert((140L until 170L).forall(calls(_) == "Negative"))
  }

  test("hto demux densifies sparse (cell, hto) inputs instead of crashing KMeans") {
    import spark.implicits._
    // cells 0-19 have ONLY an HTO1 row (HTO2 omitted = implicit zero)
    val rows = (0L until 20L).map(c => (c, "HTO1", 150.0)) ++
      (20L until 40L).flatMap(c => Seq((c, "HTO1", 1.0), (c, "HTO2", 160.0)))
    val calls = HtoDemux.demux(rows.toDF("cell_id", "hto", "count"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(calls.size == 40)
    assert((0L until 20L).forall(calls(_) == "HTO1"))
    assert((20L until 40L).forall(calls(_) == "HTO2"))
  }

  test("binnedSampling draws at most ctrlSize per cut, seeded, excluding the set") {
    import spark.implicits._
    val values = (1 to 300).map(i => (i.toLong, i / 10.0)).toDF("feat_id", "value")
    val set = Seq(5L, 150L, 295L).toDF("feat_id")
    val c1 = Pseudobulk.binnedSampling(values, set, ctrlSize = 10, nBins = 5, seed = 1L)
      .collect().map(_.getLong(0)).toSet
    val c2 = Pseudobulk.binnedSampling(values, set, ctrlSize = 10, nBins = 5, seed = 1L)
      .collect().map(_.getLong(0)).toSet
    val c3 = Pseudobulk.binnedSampling(values, set, ctrlSize = 10, nBins = 5, seed = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(c1 == c2, "same seed must reproduce the sample")
    assert(c1 != c3, "different seed should differ")
    assert(c1.intersect(Set(5L, 150L, 295L)).isEmpty)
    assert(c1.size <= 3 * 10 && c1.nonEmpty)
  }

  test("makeBulk pseudoReps splits groups into near-equal seeded reps") {
    import spark.implicits._
    val coo = (0L until 90L).flatMap(c => Seq((c, 1L, 1.0), (c, 2L, 2.0)))
      .toDF("cell_id", "feat_id", "value")
    val cg = (0L until 90L).map(c => (c, if (c < 45) "A" else "B"))
      .toDF("cell_id", "group")
    val bulk = Pseudobulk.makeBulk(coo, cg, pseudoReps = 3, seed = 42L)
    val groups = bulk.select("group").distinct().collect().map(_.getString(0)).toSet
    assert(groups == Set("A_Rep1", "A_Rep2", "A_Rep3", "B_Rep1", "B_Rep2", "B_Rep3"))
    // 45 cells / 3 reps = 15 cells per rep; feat 1 value 1.0 per cell
    val sums = bulk.filter(col("feat_id") === 1).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(sums.values.forall(_ == 15.0), s"unequal reps: $sums")
  }
}
