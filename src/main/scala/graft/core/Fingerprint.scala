package graft.core

/** The one content-fingerprint aggregate every memo layer keys by
  * (DriverMemo / FrameMemo / SuffixOps levels / CacheStore manifests).
  *
  * Form: order-independent per-row xxhash64, combined as
  * `bit_xor ∥ sum` — BOTH aggregates, because each one's blind spot is
  * the other's strength. xor + count alone lets two same-count inputs
  * whose differing rows occur in even multiplicity collide (pairwise
  * cancellation: x ⊕ x = 0); an additive sum does not cancel under
  * that regime, and conversely the xor catches the additive
  * rearrangements a sum is blind to. A collision now needs BOTH a
  * zero xor-difference and a zero sum-difference — back to the
  * generic 2⁻⁶⁴-per-aggregate regime with no structured failure mode.
  *
  * The sum runs over `decimal(38,0)` casts: under ANSI mode a Long sum
  * of 2⁶³-range hashes is an overflow ERROR (the reason
  * ConnectedComponents.checksum is xor-only), while decimal(38)
  * overflows only past ~10¹⁹ rows. `concat_ws` makes the result a
  * null-safe STRING: empty input → "" (callers map that to their
  * "empty" sentinel); callers append row count + every shaping
  * parameter to the memo key themselves.
  */
object Fingerprint {
  /** Single-expression form. NOTE: `xxhash64($cols)` appears under both
    * aggregates and aggregate codegen does NOT subexpression-eliminate
    * across them — measured 1.6× slower than the pre-projected pair
    * below at 50M rows. Kept for tiny keying scans (id columns, ≤HVG
    * rows) where a second projection isn't worth the call-site noise;
    * every big-frame memo key uses [[hashExpr]]+[[aggOfHash]]. */
  def sqlExpr(cols: String): String =
    s"concat_ws('_', bit_xor(xxhash64($cols)), " +
      s"sum(cast(xxhash64($cols) as decimal(38,0))))"

  /** Pre-projected form: project `hashExpr` to a column once, then
    * aggregate it with `aggOfHash` — each row hashes ONCE (1.6× faster
    * than [[sqlExpr]] at 50M rows). Same xor ∥ sum result, bit-equal. */
  def hashExpr(cols: String): String = s"xxhash64($cols)"
  def aggOfHash(hashCol: String): String =
    s"concat_ws('_', bit_xor($hashCol), " +
      s"sum(cast($hashCol as decimal(38,0))))"
}
