package graft.inet

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational inet operators — the JOIN form of the reference's `<<=`
  * showcase (reference README.md:85-99 joins conn logs against subnet
  * lists with `addr <<= subnet`).
  *
  * A naive formulation (`logs CROSS JOIN nets WHERE inet_contains(...)`)
  * plans a BroadcastNestedLoopJoin: every log row is tested against
  * every subnet — fine for a ten-row intel list, quadratic death at a
  * 100k-entry one. [[cidrJoin]] makes it an EQUI-join: both sides are
  * keyed by the first `bucketBits` of the address space (subnets
  * shorter than the bucket expand to the 2^(bucketBits−prefix) buckets
  * they span — bounded, and typically tiny because real intel lists are
  * /16 or longer), the join runs hash-partitioned (or auto-broadcast
  * when the expanded net side is small), and the exact `inet_contains`
  * test is a residual filter. v4/v6 keys are disjoint by construction.
  */
object InetOps {

  /** Bucket key for one address: family tag (bit 17) + first 16 bits.
    * Returns null for unparseable addresses (they cannot match any
    * subnet — inner join drops them, matching `<<=` NULL semantics). */
  private[inet] def addrBucket(addr: String, bucketBits: Int): Option[Int] =
    InetFunctions.parse(addr).map { b =>
      val fam = if (b.length == 4) 0 else 1
      (fam << 17) | hiBits(b, bucketBits)
    }

  /** Every bucket a CIDR subnet spans: one when prefix ≥ bucketBits,
    * 2^(bucketBits−prefix) when shorter. */
  private[inet] def cidrBuckets(cidr: String, bucketBits: Int): Seq[Int] = {
    val slash = cidr.indexOf('/')
    val (netPart, prefix) =
      if (slash < 0) (cidr, -1)
      else (cidr.substring(0, slash),
        try cidr.substring(slash + 1).toInt catch { case _: NumberFormatException => return Seq.empty })
    InetFunctions.parse(netPart) match {
      case None => Seq.empty
      case Some(b) =>
        val fam = if (b.length == 4) 0 else 1
        val maxBits = b.length * 8
        val p = if (prefix < 0) maxBits else prefix // bare address = host route
        if (p < 0 || p > maxBits) Seq.empty
        else if (p >= bucketBits) Seq((fam << 17) | hiBits(b, bucketBits))
        else {
          val base = hiBits(b, bucketBits) & (~0 << (bucketBits - p))
          val n = 1 << (bucketBits - p)
          (0 until n).map(i => (fam << 17) | (base + i))
        }
    }
  }

  private def hiBits(b: Array[Byte], bits: Int): Int = {
    // first `bits` bits of the address, RIGHT-aligned — bucket ids are
    // dense in [0, 2^bits), so subnet expansion can step by +1
    val hi16 = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    hi16 >>> (16 - bits)
  }

  /** Inner-join `logs` to `nets` on address-in-subnet containment.
    *
    * @param logs       rows carrying an address column (zeek addr strings)
    * @param addr       address column in `logs`
    * @param nets       subnet list carrying a CIDR column
    * @param cidr       CIDR column in `nets` ("10.0.0.0/8", "fe80::/10";
    *                   a bare address means a host route)
    * @param bucketBits prefix width of the equi-join key (≤16). Smaller =
    *                   fewer expanded rows for short prefixes but coarser
    *                   buckets; 16 suits real-world intel lists.
    */
  def cidrJoin(logs: DataFrame, addr: Column, nets: DataFrame, cidr: Column,
      bucketBits: Int = 16): DataFrame =
    bucketed(logs, addr, nets, cidr, bucketBits, "inner")

  /** `logs` rows whose address falls in AT LEAST one subnet — each log
    * row at most once, regardless of how many subnets match (the "flag
    * intel hits" form). Same bucketed equi-join shape as [[cidrJoin]]. */
  def cidrSemiJoin(logs: DataFrame, addr: Column, nets: DataFrame, cidr: Column,
      bucketBits: Int = 16): DataFrame =
    bucketed(logs, addr, nets, cidr, bucketBits, "left_semi")

  /** `logs` rows whose address matches NO subnet (the "egress to
    * unknown destinations" form). Unparseable addresses match nothing,
    * so they are KEPT — same as `NOT (addr <<= any)` over NULL-safe
    * containment. */
  def cidrAntiJoin(logs: DataFrame, addr: Column, nets: DataFrame, cidr: Column,
      bucketBits: Int = 16): DataFrame =
    bucketed(logs, addr, nets, cidr, bucketBits, "left_anti")

  private def bucketed(logs: DataFrame, addr: Column, nets: DataFrame,
      cidr: Column, bucketBits: Int, joinType: String): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16, "bucketBits must be in [1,16]")
    // Codegen-native bucket keys (StaticInvoke, like the rest of the
    // inet family) — these were ScalaUDFs until round 15. NULL input
    // propagates to a NULL bucket, which the UDFs' explicit null guards
    // produced too (None / the explode of an empty list both drop the
    // row, same as explode(NULL)).
    def bucketOfAddr(a: Column): Column =
      org.apache.spark.sql.graft.GraftSql.column(InetExpressions.addrBucket(
        org.apache.spark.sql.graft.GraftSql.expression(a), bucketBits))
    def bucketsOfCidr(c: Column): Column =
      org.apache.spark.sql.graft.GraftSql.column(InetExpressions.cidrBuckets(
        org.apache.spark.sql.graft.GraftSql.expression(c), bucketBits))
    // The caller's addr/cidr Columns are materialized into temp columns on
    // their OWN side before the join, and the residual references only
    // those temps — so logs and nets sharing column names (id, ts, …)
    // cannot make the containment predicate ambiguous. Temp names are
    // chosen to miss every existing column on either side (a frame that
    // already carries __inet_bucket must not be corrupted or collide).
    val taken = (logs.columns ++ nets.columns).toSet
    def fresh(base: String): String =
      if (!taken(base)) base
      else Iterator.from(1).map(i => s"$base$i").find(n => !taken(n)).get
    val bCol = fresh("__inet_bucket")
    val aCol = fresh("__inet_addr")
    val cCol = fresh("__inet_cidr")
    val l = logs.withColumn(aCol, addr).withColumn(bCol, bucketOfAddr(col(aCol)))
    val n = nets.withColumn(cCol, cidr).withColumn(bCol, explode(bucketsOfCidr(col(cCol))))
    joinType match {
      case "inner" =>
        l.join(n, Seq(bCol), "inner")
          .where(InetFunctions.inet_contains(col(cCol), col(aCol)))
          .drop(bCol, aCol, cCol)
      case semiOrAnti =>
        // semi/anti must apply the containment residual INSIDE the join
        // condition (a post-join filter cannot express "no subnet
        // matches"); the bucket equality keeps it an equi-join
        val cond = l(bCol) === n(bCol) &&
          InetFunctions.inet_contains(n(cCol), l(aCol))
        l.join(n, cond, semiOrAnti).drop(bCol, aCol)
    }
  }
}
