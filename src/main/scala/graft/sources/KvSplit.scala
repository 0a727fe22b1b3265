package graft.sources

/**
 * Split planners for key-ordered and paginated stores — the remaining
 * reader-family split strategies of the reference, as pure testable logic
 * emitting Spark partition plans.
 *
 *  - region-aware range split (HBase family, reference:
 *    hbase11xreader/.../Hbase11xHelper.java:290-377): intersect the user key
 *    range with sorted region boundaries, one slice per overlapped region so
 *    each Spark partition scans exactly one region server's range;
 *  - count/advice page split (MongoDB, reference:
 *    mongodbreader/.../util/CollectionSplitUtil.java:18-82): skip/limit
 *    pages;
 *  - PK-range split (OTS batch reader, reference: otsreader/.../model/
 *    OTSRange.java): numeric or string boundary ranges via [[JdbcSplit]].
 */
object KvSplit {

  /** Half-open key range [start, end); None = unbounded. */
  final case class KeyRange(start: Option[String], end: Option[String]) {
    def contains(k: String): Boolean =
      start.forall(k >= _) && end.forall(k < _)
  }

  /**
   * Region-aware slices: regions are the half-open ranges between
   * consecutive sorted `regionStarts` (first region starts unbounded if the
   * smallest start is ""), last region unbounded above. The user range is
   * clipped against each region; empty intersections drop out.
   */
  def regionAwareSlices(user: KeyRange, regionStarts: Seq[String]): Seq[KeyRange] = {
    require(regionStarts.nonEmpty, "need at least one region")
    val starts = regionStarts.sorted
    val regions = starts.zipWithIndex.map { case (s, i) =>
      val lo = if (s.isEmpty) None else Some(s)
      val hi = if (i + 1 < starts.size) Some(starts(i + 1)) else None
      KeyRange(lo, hi)
    }
    regions.flatMap { r =>
      val lo = (r.start, user.start) match {
        case (Some(a), Some(b)) => Some(if (a >= b) a else b)
        case (a, b) => a.orElse(b)
      }
      val hi = (r.end, user.end) match {
        case (Some(a), Some(b)) => Some(if (a <= b) a else b)
        case (a, b) => a.orElse(b)
      }
      (lo, hi) match {
        case (Some(l), Some(h)) if l >= h => None // empty intersection
        case _ => Some(KeyRange(lo, hi))
      }
    }
  }

  /** Skip/limit page. */
  final case class Page(skip: Long, limit: Long)

  /** Count/advice pagination: `adviceNumber` pages whose limits sum to
    * `count`, sizes differing by at most one; cumulative skips. */
  def pageSlices(count: Long, adviceNumber: Int): Seq[Page] = {
    require(adviceNumber >= 1, "adviceNumber must be >= 1")
    if (count == 0) return Seq(Page(0, 0))
    val n = math.min(adviceNumber.toLong, count).toInt
    val base = count / n
    val rem = (count % n).toInt
    val sizes = (0 until n).map(i => base + (if (i < rem) 1 else 0))
    sizes.scanLeft(0L)(_ + _).init.zip(sizes).map { case (skip, limit) => Page(skip, limit) }
  }

  /** OTS-style PK-range slices over an integer primary key. */
  def pkRangeSlices(min: BigInt, max: BigInt, slices: Int): Seq[KeyRange] = {
    val b = JdbcSplit.splitBigInt(min, max, slices)
    b.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      // last range closes at max: represent as end = max+1 (half-open)
      val end = if (i == b.size - 2) hi + 1 else hi
      KeyRange(Some(lo.toString), Some(end.toString))
    }.toSeq
  }
}
