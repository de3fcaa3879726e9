package graft.queries

/** Guarded substitution for deriving sliced-twin oracle SQL from a full
  * query's oracle string. A derived string byte-identical to its base
  * means the slice pattern did not match — i.e. a later edit to the
  * base oracle (casing, spacing, an alias) silently broke the
  * FROM-substitution. At gate SFs the unsliced twin would still
  * hash-match (the slice covers the whole corpus there), so the drift
  * would only surface at sf10 as an oracle resource failure; failing
  * loudly at oracle-map construction turns that into an immediate,
  * attributable error instead.
  */
object TwinSql {
  /** `expected` pins how many times `pattern` must occur in the base
    * SQL (default 1). A count-mismatch — total miss OR a base edit that
    * added/renamed one of several references — fails loudly instead of
    * shipping a half-sliced twin (the replacement string itself
    * contains the pattern, so a residual-occurrence check cannot tell
    * "replaced" from "missed"; an exact pre-count can). A legitimate
    * base edit that changes the reference count forces the twin author
    * to re-verify the derivation, which is the point. */
  def subst(twin: String, base: String, pattern: String, replacement: String,
      expected: Int = 1): String = {
    require(expected > 0, s"twin $twin: expected must be positive")
    val found = base.sliding(pattern.length).count(_ == pattern)
    require(found == expected,
      s"twin $twin: slice pattern '$pattern' occurs $found time(s) in the base " +
        s"oracle SQL, expected $expected — re-verify the twin derivation")
    base.replace(pattern, replacement)
  }
}
