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
  def sqlExpr(cols: String): String =
    s"concat_ws('_', bit_xor(xxhash64($cols)), " +
      s"sum(cast(xxhash64($cols) as decimal(38,0))))"
}
