package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.CacheStore
import graft.pipeline.{Coral, Pseudotime}

class AdvancedPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pseudotime is monotone along a chain graph from the source") {
    // chain 1-2-3-4-5, symmetric unit weights
    val edges = (1L to 4L).flatMap(i =>
      Seq((i, i + 1, 1.0), (i + 1, i, 1.0))).toDF("src", "dst", "weight")
    val src = Seq(1L).toDF("cell_id")
    val pt = Pseudotime.score(edges, src, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(approx(pt(1L), 0.0))
    assert(approx(pt(5L), 1.0))
    assert(pt(1L) < pt(2L) && pt(2L) < pt(3L) && pt(3L) < pt(4L) && pt(4L) < pt(5L))
  }

  test("coral: identical distributions give near-identity correction") {
    val vecs = (1 to 50).map(i =>
      (i.toLong, Seq(i * 0.1, math.sin(i * 0.7), i % 7 * 1.0))).toDF("cell_id", "latent")
    val c = Coral.covariance(vecs)
    val a = Coral.correction(c, c)
    // Cs = Ct => A = (C+I)^-1/2 (C+I)^1/2 = I
    (0 until 3).foreach { i =>
      (0 until 3).foreach { j =>
        assert(approx(a(i, j), if (i == j) 1.0 else 0.0, 1e-8), s"a($i,$j)=${a(i, j)}")
      }
    }
    // applying identity leaves vectors unchanged
    val out = Coral.apply(vecs, a).orderBy("cell_id").select("latent")
      .as[Seq[Double]].head()
    assert(approx(out.head, 0.1, 1e-8))
  }

  test("cache: recompute only when input fingerprint changes") {
    val root = Files.createTempDirectory("graft_cache").toString
    val cache = new CacheStore(root)
    var computes = 0
    val input = Seq((1L, 2.0), (2L, 3.0)).toDF("cell_id", "value")
    def run() = cache.getOrCompute(spark, "sum", Map("k" -> "1"), input) {
      computes += 1
      input.agg(sum("value").as("s"))
    }
    val r1 = run(); val r2 = run()
    assert(computes === 1) // second call served from cache
    assert(rows(r1) === rows(r2))
    // different params => separate cache entry
    cache.getOrCompute(spark, "sum", Map("k" -> "2"), input) {
      computes += 1; input.agg(sum("value").as("s"))
    }
    assert(computes === 2)
    // changed input => fingerprint mismatch => recompute
    val input2 = Seq((1L, 2.0), (2L, 4.0)).toDF("cell_id", "value")
    cache.getOrCompute(spark, "sum", Map("k" -> "1"), input2) {
      computes += 1; input2.agg(sum("value").as("s"))
    }
    assert(computes === 3)
  }

  test("lsi projects onto uncentered singular vectors, skipping the first") {
    import org.apache.spark.ml.linalg.Vectors
    val vecs = (1 to 20).map { i =>
      (i.toLong, Vectors.dense(i * 1.0, i * 2.0 + (i % 3), (i % 5) * 1.0))
    }.toDF("cell_id", "features")
    val r = graft.pipeline.Reduce.lsi(vecs, dims = 2, skipFirst = true)
    assert(r.count() === 20)
    assert(r.select(size($"latent")).distinct().as[Int].head() === 2)
    // deterministic
    val r2 = graft.pipeline.Reduce.lsi(vecs, dims = 2, skipFirst = true)
    assert(rows(r.orderBy("cell_id")) === rows(r2.orderBy("cell_id")))
  }

  test("pcaDeterministic spans the same subspace as MLlib PCA") {
    import org.apache.spark.ml.linalg.Vectors
    val rnd = new scala.util.Random(11)
    // anisotropic cloud: two strong directions + noise in four dims
    val vecs = (1 to 300).map { i =>
      val a = rnd.nextGaussian() * 5; val b = rnd.nextGaussian() * 2
      (i.toLong, Vectors.dense(
        a + rnd.nextGaussian() * 0.1, b + rnd.nextGaussian() * 0.1,
        0.5 * a - b + rnd.nextGaussian() * 0.1, rnd.nextGaussian() * 0.1))
    }.toDF("cell_id", "features")
    val det = graft.pipeline.Reduce.pcaDeterministic(vecs, dims = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ml = graft.pipeline.Reduce.pca(vecs, dims = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // same subspace => per-cell projection NORMS agree (basis rotation
    // and sign are engine-private; the norm is rotation-invariant)
    val relErr = det.keys.map { c =>
      val nd = math.sqrt(det(c).map(x => x * x).sum)
      val nm = math.sqrt(ml(c).map(x => x * x).sum)
      math.abs(nd - nm) / math.max(nm, 1e-9)
    }
    assert(relErr.max < 0.01, s"projection norms diverge: max ${relErr.max}")
    // deterministic across invocations
    val det2 = graft.pipeline.Reduce.pcaDeterministic(vecs, dims = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(det == det2)
  }
}
