package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.pipeline.{Metrics, Pseudotime, Reduce}

/** ML-tagged operators exposed as driver queries (SURVEY.md §2 [ML]).
  * ALL of them now carry full DuckDB oracles despite the label: q54
  * LISI (recursive-CTE bisection), q55 PPR (unrolled CTEs), q59 LOWESS
  * (single-row list-state recursion), q60 demux (unrolled deterministic
  * Lloyd's + golden-section NB-MLE), q61 silhouette, q53 PCA
  * (subspace-iteration replay) and q67 knn_clustering (the Paris
  * agglomeration itself, integer-exact on binary KNN weights). Value
  * semantics additionally covered in ScalaTest, as the reference's own
  * CI does (SURVEY.md §5).
  */
object MlQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // z-scale + PCA latent space over the top-30-variable feature slice
    "q53_pca_latent" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val normed = graft.norm.Normalize.libSizeLog(coo)
        .select("cell_id", "feat_id", "normed")
      val stats = graft.stats.MatrixStats.featureStats(normed, Tables.nCells(coo))
      val sel = graft.stats.MatrixStats
        .topVariableFeatures(stats, nBins = 10, topN = 30, minCells = 5)
        .select("feat_id")
      val vecs = Reduce.assembleVectors(
        normed.join(broadcast(sel), Seq("feat_id")),
        Reduce.featureIndex(sel), "normed")
      // pcaDeterministic (cross-engine-replayable subspace iteration,
      // spec-tied to MLlib's subspace) so the whole chain is oracled;
      // scalar rows because the driver hash sorts plain columns
      Reduce.pcaDeterministic(vecs, dims = 5)
        .select(col("cell_id"), posexplode(col("latent")).as(Seq("component", "value")))
        .select(col("cell_id"), col("component"), round(col("value"), 4).as("value"))
        .orderBy("cell_id", "component")
    }),

    // LISI of the embedding KNN graph against the stored labels
    "q54_lisi" -> ((s, d) => {
      val e = Tables.t(s, d, "embeddings")
      val q = Sample.capped(e, "vec_id")
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val knn = graft.sim.Similarity.cosineTopK(q, e, 10)
        .select(col("qid").as("src"), col("vec_id").as("dst"),
          (lit(1.0) - col("cos")).as("dist"))
      val labels = e.select(col("vec_id").as("cell_id"),
        col("label").cast("string").as("label"))
      Metrics.lisi(knn, labels, perplexity = 5.0)
        .select(col("cell_id"), round(col("lisi"), 4).as("lisi"))
        .orderBy("cell_id")
    }),

    // LOWESS-corrected HVG variance (fit_lowess, scarf/feat_utils.py:11-46)
    "q59_hvg_lowess" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val normed = graft.norm.Normalize.libSizeLog(coo)
        .select("cell_id", "feat_id", "normed")
      val stats = graft.stats.MatrixStats.featureStats(normed, Tables.nCells(coo))
      graft.stats.Lowess.correctedVar(stats, nBins = 10, frac = 0.5)
        .select(col("feat_id"), round(col("c_var_lowess"), 4).as("c_var_lowess"))
        .orderBy("feat_id")
    }),

    // Seurat-style HTO demux: CLR → deterministic Lloyd's KMeans →
    // NB-MLE background cutoff (hto_demux, scarf/feat_utils.py:95-162);
    // fully oracled end-to-end ([[q60OracleSql]])
    "q60_hto_nb" -> ((s, d) => {
      val coo = Tables.coo(s, d)
      val counts = coo.groupBy("cell_id").agg(
          sum(when(col("feat_id").between(1, 50), col("value")).otherwise(0.0)).as("HTO1"),
          sum(when(col("feat_id").between(51, 100), col("value")).otherwise(0.0)).as("HTO2"))
        .select(col("cell_id"),
          explode(array(
            struct(lit("HTO1").as("hto"), col("HTO1").as("count")),
            struct(lit("HTO2").as("hto"), col("HTO2").as("count")))).as("e"))
        .select(col("cell_id"), col("e.hto"), col("e.count"))
      graft.stats.HtoDemux.demux(counts)
        .orderBy("cell_id")
    }),

    // full sampled graph silhouette over the embeddings' KNN graph. The
    // graph input is the oracled ANN path (Knn.bucketedSelfKnn — the
    // same seeded-LSH chain q57 replays in DuckDB), NOT all-pairs
    // cosine: the silhouette kernel itself is k-bounded, so the graph
    // build was the only O(n²) stage and this keeps the whole query
    // linear in n (Σ_b |b|·probes candidate work).
    "q61_silhouette" -> ((s, d) => {
      val e = Tables.t(s, d, "embeddings")
      val latent = e.select(col("vec_id").as("cell_id"),
        col("embedding").cast("array<double>").as("latent"))
      val knn = graft.pipeline.Knn.bucketedSelfKnn(latent, 5, rounds = 6)
        .select(col("src"), col("dst"), lit(1.0).as("weight"))
      val clusters = e.select(col("vec_id").as("cell_id"),
        col("label").cast("long").as("cluster"))
      Metrics.silhouetteScores(knn, clusters, latent, k0 = 11, seed = 4466L)
        .select(col("cluster"), round(col("silhouette"), 4).as("silhouette"))
        .orderBy("cluster")
    }),

    // run_pseudotime_aggregation end-to-end (q56's oracled bin stage →
    // feature self-KNN → Paris cut_straight → argmax-median module
    // reorder, scarf/markers.py:323-439). Fully ORACLED ([[q67OracleSql]]):
    // the binary-weight agglomeration is integer-exact, so the whole
    // merge sequence replays in SQL; the 6 dp profile rounding between
    // the stages is the cross-engine determinism fence (same role as
    // q56's output rounding)
    "q67_knn_clustering" -> ((s, d) => {
      val coo = Tables.coo(s, d).groupBy("cell_id", "feat_id")
        .agg(sum(col("value")).as("value"))
      val sel = coo.groupBy("feat_id").agg(count(lit(1)).as("nnz"))
        .orderBy(col("nnz").desc, col("feat_id")).limit(40).select("feat_id")
      val ptime = Tables.t(s, d, "orders").select(col("o_orderkey").as("cell_id"),
        unix_millis(to_utc_timestamp(col("o_orderdate"), "UTC")).as("ptime"))
      val profiles = graft.pipeline.PtimeAgg.binnedProfiles(coo, ptime, sel,
          halfWidth = 2, nBins = 20)
        .select(col("feat_id"), col("bin"), round(col("z_mean"), 6).as("z_mean"))
      graft.pipeline.PtimeAgg.knnClustering(profiles, k = 5, nClusters = 4)
        .orderBy("feat_id")
    }),

    // multi-index IVF ANN self-KNN over the embeddings (FAISS-style;
    // fully oracled — the seeded-Lloyd's training replays like q60's,
    // and every distance after the 9 dp center fence is pure IEEE)
    "q69_ivf_knn" -> ((s, d) => {
      val latent = Tables.t(s, d, "embeddings")
        .select(col("vec_id").as("cell_id"),
          col("embedding").cast("array<double>").as("latent"))
      // nLists = 32 per the n/targetListSize sizing rule (20k vectors at
      // sf0.1 → ~625/list); nProbe/rounds hold the multi-index recall
      graft.pipeline.Knn.ivfSelfKnn(latent, 5, nLists = 32, nProbe = 4, rounds = 3)
        .select(col("src"), col("dst"), round(col("dist"), 6).as("dist"),
          col("rn").cast("int").as("rn"))
        .orderBy("src", "rn")
    }),

    // lazy-PPR pseudotime over the SNN co-occurrence graph
    "q55_pseudotime" -> ((s, d) => {
      val edges = Tables.t(s, d, "lineitem").filter(col("l_partkey") % 10 === 0)
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")).distinct()
      val snn = graft.graph.GraphOps.snn(edges, 2)
      val sym = snn.select(col("i").as("src"), col("j").as("dst"),
          col("shared").cast("double").as("weight"))
        .unionByName(snn.select(col("j").as("src"), col("i").as("dst"),
          col("shared").cast("double").as("weight")))
      val source = sym.agg(min(col("src")).as("cell_id"))
      Pseudotime.score(sym, source, iters = 10)
        .select(col("cell_id"), round(col("pseudotime"), 4).as("pseudotime"))
        .orderBy("cell_id")
    }))

  /** The q59 LOWESS oracle: graft.stats.Lowess.correctedVar(nBins=10,
    * frac=0.5, iters=100) reproduced in DuckDB as a SINGLE-ROW recursive
    * CTE that carries the ≤ 10 bin-representative points as lists —
    * exactly the state the Scala fit holds on the driver. Each recursion
    * step is one robustifying iteration: bisquare delta from the current
    * residuals (median via list_aggregate), then the tricube-weighted
    * local linear fit per point. The k-nearest window per point is the
    * greedy expansion (ties prefer left) expressed as a struct sort on
    * (distance, side, −j/j); WLS sums run in ascending-j order to match
    * the Scala loop's float summation order bit-for-bit.
    */
  private def q59OracleSql: String = {
    // d_j = |xs[j]-xs[i]| / h (0 when h == 0), inside binding `bb`
    val dj = "(CASE WHEN bb.h > 0 THEN ABS(xs[j] - xs[i]) / bb.h ELSE 0.0 END)"
    // tricube: t = 1 - d^3; w0 = t*t*t, zero at d >= 1
    val w0 = s"(CASE WHEN $dj >= 1.0 THEN 0.0 ELSE " +
      s"(1.0 - $dj*$dj*$dj)*(1.0 - $dj*$dj*$dj)*(1.0 - $dj*$dj*$dj) END)"
    // WLS fitted list given the delta-list expression `dl`; three binding
    // levels via single-element list_transform: win (k-nearest window),
    // bb (h + j-ascending window indices), sm (the five WLS sums)
    def localFit(dl: String): String = {
      val w = s"($w0 * $dl[j])"
      s"""list_transform(range(1, n + 1), i ->
      list_transform([list_slice(list_sort(
          list_transform(range(1, n + 1), j ->
            {'d': ABS(xs[j] - xs[i]),
             's': CASE WHEN j = i THEN -1 WHEN j < i THEN 0 ELSE 1 END,
             'jj': CASE WHEN j < i THEN -j ELSE j END,
             'j': j})), 1, k)], win ->
        list_transform([{'h': win[k].d,
                         'wj': list_sort(list_transform(win, w -> w.j))}], bb ->
          list_transform([{
              'sw':   list_sum(list_transform(bb.wj, j -> $w)),
              'swx':  list_sum(list_transform(bb.wj, j -> $w * xs[j])),
              'swy':  list_sum(list_transform(bb.wj, j -> $w * ys[j])),
              'swxx': list_sum(list_transform(bb.wj, j -> $w * xs[j] * xs[j])),
              'swxy': list_sum(list_transform(bb.wj, j -> $w * xs[j] * ys[j]))}], sm ->
            CASE WHEN sm.sw <= 0 THEN ys[i]
                 WHEN ABS(sm.sw * sm.swxx - sm.swx * sm.swx)
                      < 1e-12 * GREATEST(1.0, sm.swxx * sm.sw) THEN sm.swy / sm.sw
                 ELSE (sm.swy - ((sm.sw * sm.swxy - sm.swx * sm.swy)
                        / (sm.sw * sm.swxx - sm.swx * sm.swx)) * sm.swx) / sm.sw
                      + ((sm.sw * sm.swxy - sm.swx * sm.swy)
                        / (sm.sw * sm.swxx - sm.swx * sm.swx)) * xs[i]
            END)[1])[1])[1])"""
    }
    // robust scale s = max(median |res|, 1e-9 * max|y|); bisquare delta
    val sExpr = "GREATEST(list_aggregate(list_transform(range(1, n + 1), " +
      "i -> ABS(ys[i] - fitted[i])), 'median'), 1e-9 * may)"
    val u = s"((ys[i] - fitted[i]) / (6.0 * $sExpr))"
    val nd = s"CASE WHEN it = -1 OR $sExpr <= 0 THEN delta " +
      s"ELSE list_transform(range(1, n + 1), i -> " +
      s"CASE WHEN ABS($u) >= 1.0 THEN 0.0 " +
      s"ELSE (1.0 - $u*$u)*(1.0 - $u*$u) END) END"
    // MATERIALIZED everywhere floats feed two consumers: a re-evaluated
    // stats subtree would re-run DuckDB's parallel sums with a different
    // partial order, and the min-la feature sits exactly on bin 0's edge
    s"""WITH RECURSIVE normed AS MATERIALIZED (
    SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
           LN(1 + 10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)) AS normed
    FROM lineitem),
  nc AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total_cells FROM lineitem),
  stats AS MATERIALIZED (
    SELECT feat_id,
           SUM(normed) / nc.n_total_cells AS avg,
           (SUM(normed * normed) - SUM(normed) * SUM(normed) / nc.n_total_cells)
             / (nc.n_total_cells - 1) AS sigmas
    FROM normed CROSS JOIN nc GROUP BY feat_id, nc.n_total_cells),
  s AS MATERIALIZED (SELECT feat_id, LN(avg) AS la, LN(sigmas) AS lb FROM stats
        WHERE avg > 0 AND sigmas > 0),
  bounds AS MATERIALIZED (SELECT MIN(la) AS lo, MAX(la) AS hi FROM s),
  binned AS MATERIALIZED (SELECT s.feat_id, s.la, s.lb,
                    CAST(GREATEST(LEAST(FLOOR((s.la - b.lo) / ((b.hi - b.lo) / 10)), 9), 0) AS INT) AS bin
             FROM s CROSS JOIN bounds b),
  reps AS MATERIALIZED (SELECT bin, la AS ra, lb AS rb FROM (
             SELECT bin, la, lb,
                    ROW_NUMBER() OVER (PARTITION BY bin ORDER BY lb, feat_id) AS rn
             FROM binned) WHERE rn = 1),
  pts AS (SELECT LIST(ra ORDER BY bin) AS xs, LIST(rb ORDER BY bin) AS ys,
                 LIST(bin ORDER BY bin) AS bins, LEN(LIST(ra)) AS n,
                 GREATEST(2, LEAST(LEN(LIST(ra)),
                   CAST(CEIL(0.5 * LEN(LIST(ra))) AS INT))) AS k,
                 MAX(ABS(rb)) AS may
          FROM reps),
  rec AS (
    SELECT -1 AS it, xs, ys, bins, n, k, may,
           list_transform(xs, x -> 1.0) AS delta, ys AS fitted
    FROM pts
    UNION ALL
    SELECT it + 1, xs, ys, bins, n, k, may,
           $nd AS nd,
           ${localFit("nd")} AS f2
    FROM rec WHERE it < 100),
  fin AS (SELECT * FROM rec WHERE it = 100),
  corr AS (SELECT UNNEST(bins) AS bin, UNNEST(fitted) AS bcf FROM fin)
  SELECT b.feat_id, ROUND(EXP(b.lb - c.bcf), 4) AS c_var_lowess
  FROM binned b JOIN corr c ON b.bin = c.bin
  ORDER BY b.feat_id"""
  }

  /** The q53 deterministic-PCA oracle: Reduce.pcaDeterministic replayed
    * in DuckDB — HVG top-30 (q12's oracle machinery), dense z-scaled
    * vectors over 5 dp-rounded moments, 5 dp-rounded covariance, then
    * the fixed-count subspace iteration (matvec + classical Gram-Schmidt)
    * as a recursive CTE over a single row carrying the 5×30 basis.
    * Every iteration step is pure +,*,/,sqrt in the same evaluation
    * order as the Scala loop — all correctly-rounded IEEE ops, so
    * identical (rounded) covariance bits give identical basis bits.
    * Intermediates share through nested single-element list_transform
    * bindings (a lateral-alias chain would re-inline each matvec
    * exponentially), and the identity init is CAST to DOUBLE (bare 1.0
    * literals type as DECIMAL(2,1) and the recursive CTE would unify —
    * i.e. quantize — every iteration's basis to one decimal).
    * Exact match at sf0.01: 4410/4410 latent values.
    */
  private def q53OracleSql: String = {
    val d = 30; val k = 5; val iters = 300
    val rng = s"range(1, ${d + 1})"
    def dotL(a: String, b: String) =
      s"list_sum(list_transform($rng, i2 -> $a[i2] * $b[i2]))"
    // normalize(u): bind u, then its norm
    def gs(uExpr: String) =
      s"list_transform([$uExpr], u -> " +
        s"list_transform([SQRT(list_sum(list_transform(u, e -> e * e)))], nrm -> " +
        s"CASE WHEN nrm > 0 THEN list_transform(u, e -> e / nrm) ELSE u END)[1])[1]"
    // classical GS residual of wN[j] against nv1..nv{j-1}, left-assoc
    def uExpr(j: Int): String =
      if (j == 1) "wN[1]"
      else {
        val ds = (1 until j).map(l => s"'d$l': ${dotL(s"wN[$j]", s"nv$l")}").mkString(", ")
        val sub = (1 until j).foldLeft(s"wN[$j][i]") { (acc, l) =>
          s"($acc - ds.d$l * nv$l[i])"
        }
        s"list_transform([{$ds}], ds -> list_transform($rng, i -> $sub))[1]"
      }
    val mv = "list_value(" + (1 to k).map(j =>
      s"list_transform($rng, i -> list_sum(list_transform($rng, kk -> c[i][kk] * v[$j][kk])))")
      .mkString(", ") + ")"
    val vNext = {
      val sb = new StringBuilder(s"list_transform([$mv], wN -> ")
      var close = ")[1]"
      for (j <- 1 to k) {
        sb.append(s"list_transform([${gs(uExpr(j))}], nv$j -> ")
        close += ")[1]"
      }
      sb.append("list_value(" + (1 to k).map(j => s"nv$j").mkString(", ") + ")")
      sb.append(close)
      sb.toString
    }
    val ident = (1 to k).map(j =>
      s"list_transform($rng, i -> CASE WHEN i = $j THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)")
      .mkString(", ")
    s"""WITH RECURSIVE normed AS MATERIALIZED (
    SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
           LN(1 + 10000.0 * l_quantity / SUM(l_quantity) OVER (PARTITION BY l_orderkey)) AS normed
    FROM lineitem),
  nc AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total_cells FROM lineitem),
  stats AS MATERIALIZED (
    SELECT feat_id,
           COUNT(CASE WHEN normed > 0 THEN 1 END) AS normed_n,
           (SUM(normed * normed) - SUM(normed) * SUM(normed) / nc.n_total_cells)
             / (nc.n_total_cells - 1) AS sigmas,
           SUM(normed) / nc.n_total_cells AS avg_all
    FROM normed CROSS JOIN nc GROUP BY feat_id, nc.n_total_cells),
  s AS MATERIALIZED (
    SELECT feat_id, sigmas, LOG2(avg_all) AS log_mean
    FROM stats WHERE normed_n >= 5),
  bounds AS MATERIALIZED (SELECT MIN(log_mean) AS lo, MAX(log_mean) AS hi FROM s),
  binned AS MATERIALIZED (
    SELECT s.*, LEAST(FLOOR((s.log_mean - b.lo) / ((b.hi - b.lo) / 10)), 9) AS bin
    FROM s CROSS JOIN bounds b),
  sel AS MATERIALIZED (
    SELECT feat_id FROM (
      SELECT feat_id, ROUND(sigmas / AVG(sigmas) OVER (PARTITION BY bin), 6) AS c_var
      FROM binned)
    ORDER BY c_var DESC, feat_id LIMIT $d),
  fidx AS MATERIALIZED (
    SELECT feat_id, CAST(ROW_NUMBER() OVER (ORDER BY feat_id) AS INT) AS idx
    FROM sel),
  vals AS MATERIALIZED (
    SELECT n.cell_id, f.idx, SUM(n.normed) AS x
    FROM normed n JOIN fidx f ON n.feat_id = f.feat_id
    GROUP BY n.cell_id, f.idx),
  cells0 AS MATERIALIZED (SELECT DISTINCT cell_id FROM vals),
  n1 AS (SELECT COUNT(*) AS n FROM cells0),
  dense AS MATERIALIZED (
    SELECT c.cell_id, f.idx, COALESCE(v.x, 0.0) AS x
    FROM cells0 c CROSS JOIN fidx f
    LEFT JOIN vals v ON c.cell_id = v.cell_id AND f.idx = v.idx),
  mom AS MATERIALIZED (
    SELECT idx, ROUND(SUM(x) / n1.n, 5) AS m,
           ROUND(SQRT((SUM(x * x) - SUM(x) * SUM(x) / n1.n) / (n1.n - 1)), 5) AS sd
    FROM dense CROSS JOIN n1 GROUP BY idx, n1.n),
  z AS MATERIALIZED (
    SELECT d.cell_id, d.idx,
           CASE WHEN mom.sd > 0 THEN (d.x - mom.m) / mom.sd ELSE 0.0 END AS z
    FROM dense d JOIN mom ON d.idx = mom.idx),
  covu AS MATERIALIZED (
    SELECT a.idx AS i, b.idx AS j,
           ROUND(SUM(a.z * b.z) / (n1.n - 1), 5) AS cv
    FROM z a JOIN z b ON a.cell_id = b.cell_id AND a.idx <= b.idx
    CROSS JOIN n1
    GROUP BY a.idx, b.idx, n1.n),
  covf AS MATERIALIZED (
    SELECT i, j, cv FROM covu
    UNION ALL SELECT j, i, cv FROM covu WHERE i <> j),
  covm AS MATERIALIZED (
    SELECT LIST(rl ORDER BY i) AS c FROM (
      SELECT i, LIST(cv ORDER BY j) AS rl FROM covf GROUP BY i)),
  iter AS (
    SELECT 0 AS it, c, list_value($ident) AS v
    FROM covm
    UNION ALL
    SELECT it + 1, c, $vNext AS v
    FROM iter WHERE it < $iters),
  fin AS MATERIALIZED (SELECT v FROM iter WHERE it = $iters),
  zrows AS MATERIALIZED (
    SELECT cell_id, LIST(z ORDER BY idx) AS zs FROM z GROUP BY cell_id)
  SELECT r.cell_id, CAST(comp.j - 1 AS INT) AS component,
         ROUND(list_sum(list_transform($rng, i -> r.zs[i] * f.v[comp.j][i])), 4) AS value
  FROM zrows r CROSS JOIN fin f
  CROSS JOIN (SELECT UNNEST(range(1, ${k + 1})) AS j) comp
  ORDER BY r.cell_id, component"""
  }

  /** The q67 knn_clustering oracle — the Paris agglomeration itself
    * replayed in DuckDB. The binary KNN adjacency (+ symmetrization)
    * makes every weight, mass and W an integer, so all 39 merge steps
    * are float-EXACT: the recursive CTE carries the 79×79 weight matrix,
    * masses and alive mask, each step binds the argmin pair by
    * (distance, a, b) — provably equal to the Scala lazy-invalidation
    * priority queue, since an alive pair's distance never changes —
    * and rewrites the matrix. Upstream, q56's oracled bin stage feeds
    * the 6 dp-rounded profiles (the cross-engine fence) into the exact
    * self-KNN; downstream, cut_straight is a parent-chase over the kept
    * links and the argmax-median reorder is quantile_cont + ROW_NUMBER.
    * Exact at sf0.01: 40/40 module labels.
    */
  private def q67OracleSql: String = {
    val nf = 40; val k = 5; val nC = 4; val nB = 20
    val tot = 2 * nf - 1
    val merges = nf - 1
    val keep = merges - (nC - 1)
    val rN = s"range(1, ${tot + 1})"
    val cands = s"""flatten(list_transform($rN, a ->
  flatten(list_transform(range(a + 1, ${tot + 1}), b ->
    CASE WHEN alive[a] = 1 AND alive[b] = 1 AND c[a][b] > 0
         THEN [{'d': mass[a] * mass[b] / (wtot * c[a][b]), 'a': a, 'b': b}]
         ELSE [] END))))"""
    val best = s"""list_transform([$cands], cd ->
  CASE WHEN len(cd) > 0 THEN {'a': list_sort(cd)[1].a, 'b': list_sort(cd)[1].b}
       ELSE list_transform([list_filter($rN, x2 -> alive[x2] = 1)], al ->
              {'a': al[1], 'b': al[2]})[1] END)[1]"""
    val stepV = s"""list_transform([$best], bst ->
  {'alive': list_transform($rN, x -> CASE WHEN x = bst.a OR x = bst.b THEN 0
       WHEN x = $nf + it + 1 THEN 1 ELSE alive[x] END),
   'mass': list_transform($rN, x -> CASE WHEN x = $nf + it + 1
       THEN mass[bst.a] + mass[bst.b] ELSE mass[x] END),
   'links': list_append(links, {'a': bst.a, 'b': bst.b}),
   'c': list_transform($rN, x -> list_transform($rN, y ->
      CASE WHEN x = $nf + it + 1 THEN
             CASE WHEN y = bst.a OR y = bst.b OR y = x THEN 0.0
                  ELSE c[bst.a][y] + c[bst.b][y] END
           WHEN y = $nf + it + 1 THEN
             CASE WHEN x = bst.a OR x = bst.b THEN 0.0
                  ELSE c[x][bst.a] + c[x][bst.b] END
           WHEN x = bst.a OR x = bst.b OR y = bst.a OR y = bst.b THEN 0.0
           ELSE c[x][y] END))})[1]"""
    s"""WITH RECURSIVE coo AS MATERIALIZED (
    SELECT l_orderkey AS cell_id, l_partkey AS feat_id,
           SUM(l_quantity) AS value
    FROM lineitem GROUP BY 1, 2),
  sel AS MATERIALIZED (
    SELECT feat_id FROM (
      SELECT feat_id, COUNT(*) AS nnz FROM coo GROUP BY feat_id)
    ORDER BY nnz DESC, feat_id LIMIT $nf),
  dense AS MATERIALIZED (
    SELECT o.o_orderkey AS cell_id, s.feat_id,
           EPOCH_MS(o.o_orderdate) AS ptime,
           COALESCE(c.value, 0) AS v
    FROM orders o CROSS JOIN sel s
    LEFT JOIN coo c ON c.cell_id = o.o_orderkey AND c.feat_id = s.feat_id),
  rolled AS MATERIALIZED (
    SELECT *, AVG(v) OVER (PARTITION BY feat_id ORDER BY ptime, cell_id
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS r
    FROM dense),
  st AS MATERIALIZED (
    SELECT feat_id, AVG(r) AS mu, STDDEV_SAMP(r) AS sd
    FROM rolled GROUP BY feat_id),
  zb AS MATERIALIZED (
    SELECT rolled.feat_id AS feat_id,
           CASE WHEN st.sd <> 0 THEN (rolled.r - st.mu) / st.sd ELSE 0.0 END AS z,
           NTILE($nB) OVER (PARTITION BY rolled.feat_id
             ORDER BY rolled.ptime, rolled.cell_id) AS bin
    FROM rolled JOIN st ON rolled.feat_id = st.feat_id),
  prof AS MATERIALIZED (
    SELECT feat_id, bin, ROUND(AVG(z), 6) AS z_mean
    FROM zb GROUP BY feat_id, bin),
  vecs AS MATERIALIZED (
    SELECT feat_id, LIST(z_mean ORDER BY bin) AS p FROM prof GROUP BY feat_id),
  fmap AS MATERIALIZED (
    SELECT feat_id, CAST(ROW_NUMBER() OVER (ORDER BY feat_id) AS INT) AS leaf
    FROM vecs),
  knn AS MATERIALIZED (
    SELECT src, dst FROM (
      SELECT a.feat_id AS src, b.feat_id AS dst,
             ROW_NUMBER() OVER (PARTITION BY a.feat_id ORDER BY
               SQRT(list_sum(list_transform(range(1, ${nB + 1}),
                 i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])))), b.feat_id) AS rn
      FROM vecs a JOIN vecs b ON a.feat_id <> b.feat_id)
    WHERE rn <= $k),
  wm AS MATERIALIZED (
    SELECT fa.leaf AS i, fb.leaf AS j, CAST(COUNT(*) AS DOUBLE) AS w FROM (
      SELECT src, dst FROM knn UNION ALL SELECT dst, src FROM knn) e
    JOIN fmap fa ON e.src = fa.feat_id JOIN fmap fb ON e.dst = fb.feat_id
    GROUP BY fa.leaf, fb.leaf),
  init AS MATERIALIZED (
    SELECT LIST(rl ORDER BY x) AS c,
           LIST(ms ORDER BY x) AS mass,
           LIST(CASE WHEN x <= $nf THEN 1 ELSE 0 END ORDER BY x) AS alive,
           SUM(ms) AS wtot
    FROM (
      SELECT x.x AS x,
             LIST(COALESCE(wm.w, 0.0) ORDER BY y.x) AS rl,
             SUM(COALESCE(wm.w, 0.0)) AS ms
      FROM (SELECT UNNEST($rN) AS x) x
      CROSS JOIN (SELECT UNNEST($rN) AS x) y
      LEFT JOIN wm ON wm.i = x.x AND wm.j = y.x
      GROUP BY x.x)),
  agg AS (
    SELECT 0 AS it, c, mass, alive, wtot,
           CAST([] AS STRUCT(a INT, b INT)[]) AS links
    FROM init
    UNION ALL
    SELECT it + 1, stp.c, stp.mass, stp.alive, wtot, stp.links
    FROM (SELECT *, $stepV AS stp FROM agg WHERE it < $merges)),
  linksf AS MATERIALIZED (
    SELECT links FROM agg WHERE it = $merges),
  parents AS MATERIALIZED (
    SELECT l.e.a AS child, $nf + l.j AS parent FROM (
      SELECT UNNEST(links) AS e, GENERATE_SUBSCRIPTS(links, 1) AS j
      FROM linksf) l
    WHERE l.j <= $keep
    UNION ALL
    SELECT l.e.b, $nf + l.j FROM (
      SELECT UNNEST(links) AS e, GENERATE_SUBSCRIPTS(links, 1) AS j
      FROM linksf) l
    WHERE l.j <= $keep),
  chase AS (
    SELECT leaf, leaf AS cur FROM (SELECT UNNEST(range(1, ${nf + 1})) AS leaf)
    UNION ALL
    SELECT chase.leaf, p.parent FROM chase JOIN parents p ON chase.cur = p.child),
  roots AS MATERIALIZED (
    SELECT leaf, MAX(cur) AS root FROM chase GROUP BY leaf),
  relabel AS MATERIALIZED (
    SELECT root, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, root) AS BIGINT) AS cl
    FROM (SELECT root, COUNT(*) AS cnt FROM roots GROUP BY root)),
  labels0 AS MATERIALIZED (
    SELECT f.feat_id, rl.cl AS cluster
    FROM roots r JOIN fmap f ON r.leaf = f.leaf
    JOIN relabel rl ON r.root = rl.root),
  amax AS MATERIALIZED (
    SELECT feat_id, CAST(list_position(p, list_aggregate(p, 'max')) AS BIGINT) AS am
    FROM vecs),
  med AS MATERIALIZED (
    SELECT l.cluster, quantile_cont(a.am, 0.5) AS md
    FROM labels0 l JOIN amax a ON l.feat_id = a.feat_id
    GROUP BY l.cluster),
  ord2 AS MATERIALIZED (
    SELECT cluster, CAST(ROW_NUMBER() OVER (ORDER BY md, cluster) AS BIGINT) AS newc
    FROM med)
  SELECT l.feat_id, o.newc AS cluster
  FROM labels0 l JOIN ord2 o ON l.cluster = o.cluster
  ORDER BY l.feat_id"""
  }

  /** The q60 full-demux oracle: HtoDemux.demux reproduced in DuckDB end
    * to end — CLR (6 dp-rounded normalizer), Cluster.lloyd's 25
    * deterministic KMeans iterations unrolled as assign/cent CTE pairs
    * (argmin ties to the lowest center id, 9 dp-rounded means, empty
    * clusters keep their center), background-cluster argmin, NB-MLE
    * golden section as a recursive CTE whose log-likelihood inlines the
    * SAME Lanczos lgamma constants and summation order as the Scala fit,
    * log-space ppf as a second recursive CTE, then the classify tail.
    * Zero mismatches against the Spark plan at sf0.01 (14743 calls).
    */
  private def q60OracleSql: String = {
    val phi = "((SQRT(5.0) - 1) / 2)"
    // Lanczos lgamma body for z >= 0.5 — constants and left-to-right
    // addition order identical to HtoDemux.lgamma
    def body(z: String): String = {
      val a = Seq(
        "0.99999999999980993",
        s"676.5203681218851/($z)",
        s"(-1259.1392167224028)/(($z) + 1.0)",
        s"771.32342877765313/(($z) + 2.0)",
        s"(-176.61502916214059)/(($z) + 3.0)",
        s"12.507343278686905/(($z) + 4.0)",
        s"(-0.13857109526572012)/(($z) + 5.0)",
        s"9.9843695780195716e-6/(($z) + 6.0)",
        s"1.5056327351493116e-7/(($z) + 7.0)").mkString(" + ")
      s"(0.5 * LN(2 * PI()) + (($z) - 0.5) * LN(($z) + 6.5) - (($z) + 6.5) + LN($a))"
    }
    def lgam(x: String): String =
      s"(CASE WHEN ($x) < 0.5 THEN LN(PI() / SIN(PI() * ($x))) - ${body(s"1.0 - ($x)")} " +
        s"ELSE ${body(x)} END)"
    def ll(alpha: String): String = {
      val r = s"(1.0/($alpha))"
      val p = s"($r/($r + mu))"
      s"list_sum(list_transform(vals, e -> e.m * (" +
        s"${lgam(s"e.v + $r")} - ${lgam(r)} - ${lgam("e.v + 1.0")}" +
        s" + $r * LN($p) + e.v * LN(1.0 - $p))))"
    }
    val lloyd = (1 to 25).map { t =>
      s"""
  assign$t AS MATERIALIZED (
    SELECT cell_id, x1, x2, cid FROM (
      SELECT c.cell_id, c.x1, c.x2, k.cid,
             ROW_NUMBER() OVER (PARTITION BY c.cell_id
               ORDER BY (c.x1 - k.cx)*(c.x1 - k.cx) + (c.x2 - k.cy)*(c.x2 - k.cy), k.cid) AS rn
      FROM cells c CROSS JOIN cent${t - 1} k) WHERE rn = 1),
  cent$t AS MATERIALIZED (
    SELECT p.cid, COALESCE(m.mx, p.cx) AS cx, COALESCE(m.my, p.cy) AS cy
    FROM cent${t - 1} p LEFT JOIN (
      SELECT cid, ROUND(AVG(x1), 9) AS mx, ROUND(AVG(x2), 9) AS my
      FROM assign$t GROUP BY cid) m ON p.cid = m.cid)"""
    }.mkString(",")
    val c0 = s"(8.0 - $phi * (8.0 - (-12.0)))"
    val d0 = s"((-12.0) + $phi * (8.0 - (-12.0)))"
    s"""WITH RECURSIVE h AS MATERIALIZED (
    SELECT l_orderkey AS cell_id,
           SUM(CASE WHEN l_partkey BETWEEN 1 AND 50 THEN l_quantity ELSE 0 END) AS h1,
           SUM(CASE WHEN l_partkey BETWEEN 51 AND 100 THEN l_quantity ELSE 0 END) AS h2
    FROM lineitem GROUP BY l_orderkey),
  nc AS (SELECT COUNT(*) AS n FROM h),
  f AS MATERIALIZED (
    SELECT ROUND(EXP(SUM(LN(h1 + 1)) / nc.n), 6) AS f1,
           ROUND(EXP(SUM(LN(h2 + 1)) / nc.n), 6) AS f2
    FROM h CROSS JOIN nc GROUP BY nc.n),
  cells AS MATERIALIZED (
    SELECT cell_id, h1, h2,
           LN(h1 / f.f1 + 1) AS x1, LN(h2 / f.f2 + 1) AS x2,
           MD5('4466:' || cell_id) AS hsh
    FROM h CROSS JOIN f),
  cent0 AS MATERIALIZED (
    SELECT ROW_NUMBER() OVER (ORDER BY hsh, cell_id) AS cid, x1 AS cx, x2 AS cy
    FROM (SELECT * FROM (
            SELECT cells.*, ROW_NUMBER() OVER (PARTITION BY x1, x2
              ORDER BY hsh, cell_id) AS rv FROM cells) WHERE rv = 1)
    ORDER BY hsh, cell_id LIMIT 3),$lloyd,
  avgexp AS MATERIALIZED (
    SELECT hto, cid, AVG(x) AS m FROM (
      SELECT cid, 'HTO1' AS hto, x1 AS x FROM assign25
      UNION ALL SELECT cid, 'HTO2', x2 FROM assign25) GROUP BY hto, cid),
  bg AS MATERIALIZED (SELECT hto, cid AS bgc FROM (
      SELECT hto, cid, ROW_NUMBER() OVER (PARTITION BY hto ORDER BY m, cid) AS rn
      FROM avgexp) WHERE rn = 1),
  hist AS MATERIALIZED (
    SELECT nv.hto, nv.v, CAST(COUNT(*) AS BIGINT) AS m FROM (
      SELECT a.cid, 'HTO1' AS hto, CAST(c.h1 AS DOUBLE) AS v
      FROM assign25 a JOIN cells c USING (cell_id)
      UNION ALL
      SELECT a.cid, 'HTO2', CAST(c.h2 AS DOUBLE)
      FROM assign25 a JOIN cells c USING (cell_id)) nv
    JOIN bg ON nv.hto = bg.hto AND nv.cid = bg.bgc
    GROUP BY nv.hto, nv.v),
  nb0 AS MATERIALIZED (
    SELECT hto, LIST({'v': v, 'm': m} ORDER BY v) AS vals,
           GREATEST(SUM(v * m) / SUM(m), 1e-8) AS mu
    FROM hist GROUP BY hto),
  gold AS (
    SELECT hto, vals, mu,
           CAST(-12.0 AS DOUBLE) AS lo, CAST(8.0 AS DOUBLE) AS hi,
           $c0 AS c, $d0 AS d,
           ${ll(s"EXP($c0)")} AS fc,
           ${ll(s"EXP($d0)")} AS fd,
           0 AS it
    FROM nb0
    UNION ALL
    SELECT hto, vals, mu,
           CASE WHEN fc > fd THEN lo ELSE c END AS nlo,
           CASE WHEN fc > fd THEN d ELSE hi END AS nhi,
           CASE WHEN fc > fd THEN nhi - $phi * (nhi - nlo) ELSE d END AS ncc,
           CASE WHEN fc > fd THEN c ELSE nlo + $phi * (nhi - nlo) END AS ndd,
           CASE WHEN fc > fd THEN ${ll("EXP(ncc)")} ELSE fd END AS nfc,
           CASE WHEN fc > fd THEN fc ELSE ${ll("EXP(ndd)")} END AS nfd,
           it + 1
    FROM gold WHERE it < 80 AND hi - lo > 1e-9),
  goldfin AS MATERIALIZED (
    SELECT hto, mu, EXP((lo + hi) / 2) AS alpha FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY hto ORDER BY it DESC) AS r
      FROM gold) WHERE r = 1),
  nbp AS MATERIALIZED (
    SELECT hto, mu, 1.0/alpha AS r,
           (1.0/alpha) / ((1.0/alpha) + mu) AS p
    FROM goldfin),
  ppf AS (
    SELECT hto, mu, r, p, CAST(0 AS BIGINT) AS k,
           r * LN(p) AS logpmf, EXP(r * LN(p)) AS cdf
    FROM nbp
    UNION ALL
    SELECT hto, mu, r, p, k + 1,
           logpmf + LN((k + r) / (k + 1.0)) + LN(1.0 - p) AS nlogpmf,
           cdf + EXP(nlogpmf) AS ncdf
    FROM ppf WHERE cdf < 0.99 AND k < 1000000),
  cut AS MATERIALIZED (
    SELECT hto, CAST(FLOOR(mu + k + 0.5) AS BIGINT) AS cutoff FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY hto ORDER BY k DESC) AS rr
      FROM ppf) WHERE rr = 1),
  c2 AS (SELECT cell_id, 'HTO1' AS hto, h1 AS cnt FROM h
         UNION ALL SELECT cell_id, 'HTO2', h2 FROM h),
  disc AS (SELECT c2.cell_id, c2.hto, c2.cnt,
                  CASE WHEN c2.cnt > t.cutoff THEN 1 ELSE 0 END AS pos
           FROM c2 JOIN cut t ON c2.hto = t.hto),
  best AS (SELECT cell_id, hto AS top_hto FROM (
             SELECT cell_id, hto,
                    ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY cnt DESC, hto) AS rn
             FROM disc) WHERE rn = 1),
  agg AS (SELECT cell_id, SUM(pos) AS n_pos FROM disc GROUP BY cell_id)
  SELECT a.cell_id,
         CASE WHEN a.n_pos = 0 THEN 'Negative'
              WHEN a.n_pos > 1 THEN 'Doublet'
              ELSE b.top_hto END AS call
  FROM agg a JOIN best b ON a.cell_id = b.cell_id
  ORDER BY a.cell_id"""
  }

  /** The q69 multi-index IVF ANN oracle: for each round, Cluster.lloyd's
    * training replays exactly as in q60's oracle (md5-ranked ≤trainN
    * TRAINING SAMPLE — the samp CTE mirrors ivfSelfKnn's
    * `orderBy(md5).limit(trainN)`, which diverges from whole-set training
    * once n > trainN — then md5-ranked distinct-vector init, fixed
    * iterations, 9 dp-rounded means, generalized to 128-dim center lists
    * via UNNEST/GENERATE_SUBSCRIPTS re-aggregation), then whole-set list
    * assignment against the final rounded centers, nProbe probing and
    * exact l2 within the probed lists; rounds union, dedupe on min
    * distance, global top-k. Every distance after the 9 dp center fence
    * is pure IEEE +,*,sqrt. Exact at sf0.01 (2500/2500) and sf0.1
    * (25000/25000, where the sample is a strict subset).
    */
  private def q69OracleSql: String = {
    val nLists = 32; val nProbe = 4; val rounds = 3; val iters = 10
    val k = 5; val dim = 128; val seed = 4466L; val trainN = 10000
    val rd = s"range(1, ${dim + 1})"
    def d2(a: String, c: String) =
      s"list_sum(list_transform($rd, i -> ($a[i] - $c[i]) * ($a[i] - $c[i])))"
    def lloydRound(r: Int): String = {
      val rSeed = seed + 7919 * r
      val head = s"""
  samp$r AS MATERIALIZED (
    SELECT cell_id, p FROM (
      SELECT v.*, MD5('$rSeed:' || cell_id) AS hs FROM v)
    ORDER BY hs, cell_id LIMIT $trainN),
  init$r AS MATERIALIZED (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY hsh, cell_id) AS INT) AS cid, p AS c
    FROM (SELECT * FROM (
            SELECT s.*, MD5('$rSeed:' || cell_id) AS hsh,
                   ROW_NUMBER() OVER (PARTITION BY p ORDER BY MD5('$rSeed:' || cell_id), cell_id) AS rv
            FROM samp$r s) WHERE rv = 1)
    ORDER BY hsh, cell_id LIMIT $nLists),
  cent${r}_0 AS MATERIALIZED (SELECT cid, c FROM init$r)"""
      val its = (1 to iters).map { t =>
        s"""
  asg${r}_$t AS MATERIALIZED (
    SELECT cell_id, cid FROM (
      SELECT v.cell_id, k.cid,
             ROW_NUMBER() OVER (PARTITION BY v.cell_id
               ORDER BY ${d2("v.p", "k.c")}, k.cid) AS rn
      FROM samp$r v CROSS JOIN cent${r}_${t - 1} k) WHERE rn = 1),
  cent${r}_$t AS MATERIALIZED (
    SELECT p.cid, COALESCE(m.c, p.c) AS c
    FROM cent${r}_${t - 1} p LEFT JOIN (
      SELECT cid, LIST(m ORDER BY pos) AS c FROM (
        SELECT a.cid, u.pos, ROUND(AVG(u.x), 9) AS m
        FROM asg${r}_$t a JOIN vex u ON a.cell_id = u.cell_id
        GROUP BY a.cid, u.pos)
      GROUP BY cid) m ON p.cid = m.cid)"""
      }.mkString(",")
      val tail = s"""
  lists$r AS MATERIALIZED (
    SELECT cell_id, cid AS list FROM (
      SELECT v.cell_id, k.cid,
             ROW_NUMBER() OVER (PARTITION BY v.cell_id
               ORDER BY ${d2("v.p", "k.c")}, k.cid) AS rn
      FROM v CROSS JOIN cent${r}_$iters k) WHERE rn = 1),
  probes$r AS MATERIALIZED (
    SELECT cell_id, cid AS list FROM (
      SELECT v.cell_id, k.cid,
             ROW_NUMBER() OVER (PARTITION BY v.cell_id
               ORDER BY ${d2("v.p", "k.c")}, k.cid) AS rn
      FROM v CROSS JOIN cent${r}_$iters k) WHERE rn <= $nProbe),
  cand$r AS MATERIALIZED (
    SELECT p.cell_id AS src, l.cell_id AS dst,
           SQRT(list_sum(list_transform($rd,
             i -> (a.p[i] - b.p[i]) * (a.p[i] - b.p[i])))) AS dist
    FROM probes$r p JOIN lists$r l ON p.list = l.list
    JOIN v a ON p.cell_id = a.cell_id JOIN v b ON l.cell_id = b.cell_id
    WHERE p.cell_id <> l.cell_id)"""
      head + "," + its + "," + tail
    }
    val roundCtes = (0 until rounds).map(lloydRound).mkString(",")
    val union = (0 until rounds).map(r => s"SELECT * FROM cand$r").mkString(" UNION ALL ")
    s"""WITH v AS MATERIALIZED (
    SELECT vec_id AS cell_id, embedding::DOUBLE[] AS p FROM embeddings),
  vex AS MATERIALIZED (
    SELECT cell_id, GENERATE_SUBSCRIPTS(p, 1) AS pos, UNNEST(p) AS x FROM v),$roundCtes,
  allc AS MATERIALIZED ($union),
  dd AS MATERIALIZED (
    SELECT src, dst, MIN(dist) AS dist FROM allc GROUP BY src, dst)
  SELECT src, dst, ROUND(dist, 6) AS dist, CAST(rn AS INT) AS rn FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
    FROM dd) WHERE rn <= $k
  ORDER BY src, rn"""
  }

  /** DuckDB oracles for the ML queries that ARE SQL-expressible after all:
    * q55's lazy-PPR core unrolls to 10 materialized join+aggregate CTEs
    * (materialization matters — x_k is referenced twice, so inlined CTEs
    * would re-expand 2^10 scans); q54's perplexity calibration is the
    * exact 64-step beta bisection as a recursive CTE over k-bounded
    * neighbor lists; q59's LOWESS is a single-row recursive CTE over the
    * bin-representative lists ([[q59OracleSql]]). All verified
    * bit-identical at 4 dp against the Spark plans on sf0.01.
    */
  val oracle: Map[String, String] = Map(
    "q53_pca_latent" -> q53OracleSql,
    "q59_hvg_lowess" -> q59OracleSql,
    "q60_hto_nb" -> q60OracleSql,
    "q67_knn_clustering" -> q67OracleSql,
    "q69_ivf_knn" -> q69OracleSql,
    "q55_pseudotime" -> {
      val om = (1 - 0.85).toString // Scala's exact double bits for 1-alpha
      val iters = (1 to 10).map { k =>
        s""",
         push$k AS MATERIALIZED (SELECT n.dst AS cell_id, SUM(n.p * x.x) AS pushed
                     FROM norm n JOIN x${k - 1} x ON n.src = x.cell_id GROUP BY n.dst),
         x$k AS MATERIALIZED (SELECT c.cell_id,
                    $om * (CASE WHEN c.cell_id = s.s_id THEN 1.0 ELSE 0.0 END)
                    + 0.85 * (COALESCE(xp.x, 0.0) + COALESCE(pk.pushed, 0.0)) / 2 AS x
                  FROM cells c CROSS JOIN srcv s
                  LEFT JOIN x${k - 1} xp ON c.cell_id = xp.cell_id
                  LEFT JOIN push$k pk ON c.cell_id = pk.cell_id)"""
      }.mkString
      s"""WITH e AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS src, l_partkey AS dst
           FROM lineitem WHERE l_partkey % 10 = 0),
         snn AS MATERIALIZED (
           SELECT a.src AS i, b.src AS j, CAST(COUNT(*) AS DOUBLE) AS w
           FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         sym AS MATERIALIZED (SELECT i AS src, j AS dst, w FROM snn
           UNION ALL SELECT j, i, w FROM snn),
         norm AS MATERIALIZED (
           SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM sym),
         cells AS MATERIALIZED (SELECT DISTINCT src AS cell_id FROM sym),
         srcv AS MATERIALIZED (SELECT MIN(src) AS s_id FROM sym),
         x0 AS MATERIALIZED (
           SELECT c.cell_id, CASE WHEN c.cell_id = s.s_id THEN 1.0 ELSE 0.0 END AS x
           FROM cells c CROSS JOIN srcv s)$iters,
         pot AS (SELECT cell_id, -LN(1 + x) AS pot FROM x10),
         mm AS (SELECT MIN(pot) AS lo, MAX(pot) AS hi FROM pot)
         SELECT cell_id, ROUND((pot - lo) / (hi - lo), 4) AS pseudotime
         FROM pot CROSS JOIN mm ORDER BY cell_id"""
    },

    "q61_silhouette" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, CAST(label AS BIGINT) AS cluster FROM embeddings),
         params AS (
           SELECT GREATEST(4, CAST(CEIL(LOG2(CAST(CEIL(COUNT(*) / 128.0) AS BIGINT))) AS INT)) AS np
           FROM v),
         dims AS (SELECT MAX(LEN(e)) AS nd FROM v),
         signs AS (
           SELECT s.seed, p.h,
                  LIST(CASE WHEN SUBSTRING(MD5(CONCAT(s.seed, ':', p.h, ':', j.j)), 1, 1)
                            BETWEEN '8' AND 'f' THEN CAST(1.0 AS DOUBLE)
                       ELSE CAST(-1.0 AS DOUBLE) END ORDER BY j.j) AS sv
           FROM (SELECT UNNEST(RANGE(0, 6)) AS seed) s
           CROSS JOIN (SELECT UNNEST(RANGE(0, (SELECT np FROM params))) AS h) p
           CROSS JOIN (SELECT UNNEST(RANGE(0, (SELECT nd FROM dims))) AS j) j
           GROUP BY s.seed, p.h),
         buck AS (
           SELECT g.seed, v.vec_id,
                  CAST(SUM(CASE WHEN LIST_DOT_PRODUCT(v.e, g.sv) > 0
                                THEN (1::BIGINT << g.h) ELSE 0 END) AS BIGINT) AS bucket
           FROM v CROSS JOIN signs g
           GROUP BY g.seed, v.vec_id),
         probes AS (
           SELECT seed, vec_id,
                  UNNEST(LIST_PREPEND(bucket,
                    LIST_TRANSFORM(RANGE(0, (SELECT np FROM params)),
                      h -> xor(bucket, 1::BIGINT << h)))) AS probe
           FROM buck),
         cand AS (
           SELECT DISTINCT p.vec_id AS src, b.vec_id AS dst
           FROM probes p JOIN buck b ON p.seed = b.seed AND p.probe = b.bucket
           WHERE p.vec_id != b.vec_id),
         cd AS (
           SELECT c.src, c.dst,
                  SQRT(GREATEST(LIST_DOT_PRODUCT(va.e, va.e)
                    - 2 * LIST_DOT_PRODUCT(va.e, vb.e)
                    + LIST_DOT_PRODUCT(vb.e, vb.e), 0)) AS dist
           FROM cand c
           JOIN v va ON c.src = va.vec_id
           JOIN v vb ON c.dst = vb.vec_id),
         topk AS (SELECT src, dst,
                         ROW_NUMBER() OVER (PARTITION BY src ORDER BY ROUND(dist, 6), dst) AS rn
                  FROM cd),
         knn AS MATERIALIZED (SELECT src, dst, 1.0 AS w FROM topk WHERE rn <= 5),
         cl AS (SELECT vec_id AS cell_id, cluster FROM v),
         pair AS (SELECT ca.cluster AS ca, cb.cluster AS cb, SUM(k.w) AS w
                  FROM knn k JOIN cl ca ON k.src = ca.cell_id JOIN cl cb ON k.dst = cb.cell_id
                  GROUP BY 1, 2),
         symp AS (SELECT ca, cb, SUM(w) / 2 AS w FROM (
                    SELECT ca, cb, w FROM pair UNION ALL SELECT cb, ca, w FROM pair)
                  GROUP BY ca, cb),
         tot AS (SELECT ca, SUM(w) AS tot FROM symp GROUP BY ca),
         sim AS (SELECT s.ca, s.cb,
                   CASE WHEN ta.tot + tb.tot - s.w > 0 THEN s.w / (ta.tot + tb.tot - s.w) ELSE 0 END AS sim
                 FROM symp s JOIN tot ta ON s.ca = ta.ca JOIN tot tb ON s.cb = tb.ca
                 WHERE s.ca != s.cb),
         nearest AS (SELECT ca AS cluster, cb AS near FROM (
                       SELECT *, ROW_NUMBER() OVER (PARTITION BY ca ORDER BY sim DESC, cb DESC) AS rn
                       FROM sim) WHERE rn = 1),
         sz AS (SELECT CAST(LEAST(11, (SELECT MIN(cnt) FROM (SELECT COUNT(*) AS cnt FROM cl GROUP BY cluster)) // 2) AS INT) AS k),
         sampled AS (SELECT cluster, cell_id,
                       ROW_NUMBER() OVER (PARTITION BY cluster
                         ORDER BY MD5('4466:' || cell_id), cell_id) AS rn
                     FROM cl),
         s1 AS (SELECT s.cluster, s.cell_id AS a_id, v.e AS va FROM sampled s
                JOIN v ON s.cell_id = v.vec_id CROSS JOIN sz WHERE s.rn <= sz.k),
         s2 AS (SELECT s.cluster, s.cell_id AS b_id, v.e AS vb FROM sampled s
                JOIN v ON s.cell_id = v.vec_id CROSS JOIN sz
                WHERE s.rn > sz.k AND s.rn <= 2 * sz.k),
         selfp AS (SELECT s1.cluster, s1.a_id, s2.b_id,
                     SQRT(GREATEST(LIST_DOT_PRODUCT(va, va) - 2 * LIST_DOT_PRODUCT(va, vb)
                       + LIST_DOT_PRODUCT(vb, vb), 0)) AS d
                   FROM s1 JOIN s2 ON s1.cluster = s2.cluster),
         selfd AS (SELECT cluster, AVG(d) AS self_d FROM (
                     SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster, a_id ORDER BY d, b_id) AS prn
                     FROM selfp) t CROSS JOIN sz WHERE t.prn <= sz.k - 1 GROUP BY cluster),
         otherp AS (SELECT s1.cluster, s1.a_id, o.a_id AS b_id,
                      SQRT(GREATEST(LIST_DOT_PRODUCT(s1.va, s1.va) - 2 * LIST_DOT_PRODUCT(s1.va, o.va)
                        + LIST_DOT_PRODUCT(o.va, o.va), 0)) AS d
                    FROM s1 JOIN nearest n ON s1.cluster = n.cluster
                    JOIN s1 o ON o.cluster = n.near),
         otherd AS (SELECT cluster, AVG(d) AS other_d FROM (
                      SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster, a_id ORDER BY d, b_id) AS prn
                      FROM otherp) t CROSS JOIN sz WHERE t.prn <= sz.k - 1 GROUP BY cluster)
         SELECT s.cluster, ROUND((o.other_d - s.self_d) / GREATEST(s.self_d, o.other_d), 4) AS silhouette
         FROM selfd s JOIN otherd o ON s.cluster = o.cluster ORDER BY s.cluster""",

    "q54_lisi" ->
      ("""WITH RECURSIVE
         q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE """ + Sample.inSql("embeddings", "vec_id", "vec_id") + """),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         p0 AS (SELECT q.qid, c.vec_id,
                  LIST_DOT_PRODUCT(qv, cv)
                    / (SQRT(LIST_DOT_PRODUCT(qv, qv)) * SQRT(LIST_DOT_PRODUCT(cv, cv))) AS cos
                FROM q CROSS JOIN c WHERE q.qid != c.vec_id),
         topk AS (SELECT qid, vec_id, ROUND(cos, 6) AS cos,
                         ROW_NUMBER() OVER (PARTITION BY qid
                           ORDER BY ROUND(cos, 6) DESC, vec_id) AS rn
                  FROM p0),
         knn AS MATERIALIZED (
           SELECT qid AS src, vec_id AS dst, 1.0 - cos AS dist FROM topk WHERE rn <= 10),
         lab AS (SELECT vec_id AS dst, CAST(label AS VARCHAR) AS label FROM embeddings),
         agg AS MATERIALIZED (
           SELECT k.src,
                  LIST(k.dist * k.dist ORDER BY k.dist, k.dst) AS d2s,
                  LIST(l.label ORDER BY k.dist, k.dst) AS labels
           FROM knn k JOIN lab l ON k.dst = l.dst GROUP BY k.src),
         bis AS (
           SELECT src, d2s, labels, CAST(1.0 AS DOUBLE) AS beta,
                  CAST('-infinity' AS DOUBLE) AS lo, CAST('infinity' AS DOUBLE) AS hi, 0 AS it
           FROM agg
           UNION ALL
           SELECT src, d2s, labels,
                  CASE WHEN h > logu THEN (CASE WHEN isinf(hi) THEN beta * 2 ELSE (beta + hi) / 2 END)
                       ELSE (CASE WHEN isinf(lo) THEN beta / 2 ELSE (beta + lo) / 2 END) END,
                  CASE WHEN h > logu THEN beta ELSE lo END,
                  CASE WHEN h > logu THEN hi ELSE beta END,
                  it + 1
           FROM (SELECT *, LN(sumw) + beta * swd / sumw AS h, LN(5.0) AS logu
                 FROM (SELECT *,
                         LIST_SUM(LIST_TRANSFORM(d2s, d -> EXP(-beta * d))) AS sumw,
                         LIST_SUM(LIST_TRANSFORM(d2s, d -> d * EXP(-beta * d))) AS swd
                       FROM bis))
           WHERE it < 63 AND ABS(h - logu) >= 1e-5),
         fin AS (SELECT src, d2s, labels, beta
                 FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY it DESC) AS r
                       FROM bis)
                 WHERE r = 1),
         ex AS (SELECT src, UNNEST(labels) AS label, UNNEST(d2s) AS d2, beta,
                       LIST_SUM(LIST_TRANSFORM(d2s, d -> EXP(-beta * d))) AS sumw
                FROM fin),
         pl AS (SELECT src, label, SUM(EXP(-beta * d2) / sumw) AS p FROM ex GROUP BY src, label)
         SELECT src AS cell_id, ROUND(1.0 / SUM(p * p), 4) AS lisi
         FROM pl GROUP BY src ORDER BY cell_id"""))
}
