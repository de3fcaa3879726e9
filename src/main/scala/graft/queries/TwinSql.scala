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
  def subst(twin: String, base: String, pattern: String, replacement: String): String = {
    val derived = base.replace(pattern, replacement)
    require(derived != base,
      s"twin $twin: slice pattern '$pattern' did not match the base oracle SQL")
    derived
  }
}
