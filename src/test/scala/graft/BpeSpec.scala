package graft

/** Mathematical invariants of the in-engine BPE trainer — the oracle
  * gate proves cross-engine parity of the rounds; these prove the
  * merges mean what they claim. */
class BpeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("segmentation is lossless and each learned merge reaches its fixed point") {
    val seg = SparkEntry.queries("bpe_segment")(spark, dir).collect()
    assert(seg.nonEmpty)
    // losslessness: the symbols of every segmentation concatenate back
    // to the word — a merge can regroup characters, never drop them
    seg.foreach { r =>
      val (word, s) = (r.getString(0), r.getString(2))
      val syms = s.stripPrefix("(").stripSuffix(")").split("\\)\\(")
      assert(syms.mkString == word, s"$word segmented as $s")
    }
    // fixed point: a merged pair cannot survive adjacent in any final
    // segmentation — replace is exhaustive left-to-right, and later
    // merges only grow symbols (they cannot split one back into the
    // pair's halves)
    val merges = SparkEntry.queries("bpe_merges")(spark, dir).collect()
    assert(merges.length == graft.ops.TextOps.BpeRounds)
    merges.foreach { m =>
      val (l, r) = (m.getString(1), m.getString(2))
      val leftover = seg.find(_.getString(2).contains(s"($l)($r)"))
        .map(_.getString(2)).getOrElse("")
      assert(leftover.isEmpty, s"pair ($l,$r) survives in $leftover")
      assert(m.getLong(3) > 0)
    }
    // merges are distinct pairs (a repeated winner would mean the
    // previous round's replace silently failed)
    val pairs = merges.map(m => (m.getString(1), m.getString(2)))
    assert(pairs.distinct.length == pairs.length)
  }
}
