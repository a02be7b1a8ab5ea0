package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Absolute query-budget cap for the exact-truth recall/metric gates
  * (q125/q144/q174/q175/q182/q192/q241/q242 and the mapping-facade
  * hits): the 1-in-`stride` id pick keeps the historical sample, and
  * the md5-ordered LIMIT caps it at QCAP points — min(n/stride, QCAP)
  * — so the exact brute-force side is O(n·QCAP) at ANY scale instead
  * of O(n²/stride). Spark plans orderBy+limit as TakeOrderedAndProject
  * (a distributed partial top-K — no single-partition sort), and the
  * md5 pick replays exactly in DuckDB (same UTF-8 hex string, same id
  * tiebreak). QCAP = 256 sits above every test SF's stride count (max
  * 40 at sf0.1), so the cap is provably vacuous in the oracle gates —
  * it exists for the 100× run, where n²/stride is the difference
  * between a bounded report and an un-runnable one.
  */
object Sample {
  val QCAP = 256

  /** The capped query sample of `df` on integer id column `idCol`. */
  def capped(df: DataFrame, idCol: String, stride: Int = 50): DataFrame =
    df.filter(col(idCol) % stride === 0)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(QCAP)

  /** The identical pick on the DuckDB side, as an IN-subquery over the
    * oracle CTE `cte` whose integer id column is `idCol`; `idExpr` is
    * the (possibly qualified) expression being tested. */
  def inSql(cte: String, idCol: String, idExpr: String,
            stride: Int = 50): String =
    s"""$idExpr IN (SELECT $idCol FROM $cte WHERE $idCol % $stride = 0
           ORDER BY MD5(CAST($idCol AS VARCHAR)), $idCol LIMIT $QCAP)"""
}
