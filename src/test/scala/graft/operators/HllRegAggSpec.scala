package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Differential + algebraic pins for [[Profile.HllRegAgg]], the
  * aggregator that replaced the per-cell unpivot register group-by (the
  * r13 profiler rewrite). The gates prove the END result on the real
  * tables; this spec proves the aggregator's ALGEBRA, so any future
  * edit that breaks mergeability (and thus distributed correctness
  * under arbitrary partial-aggregation splits) fails here, not at the
  * driver. */
class HllRegAggSpec extends AnyFunSuite {

  private val agg = Profile.HllRegAgg

  /** Independent reference: the register table the old unpivot
    * formulation aggregated — max rank per register, then the exact
    * (n_zero_regs, harmonic_num) arithmetic. */
  private def reference(hashes: Seq[Long]): (Long, Long) = {
    val byReg = hashes.filter(_ >= 0L)
      .map { h =>
        val reg = (h / 18014398509481984L).toInt
        val rem = h % 18014398509481984L
        val rnk =
          if (rem == 0L) 55
          else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
        (reg, rnk)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val zeros = 64L - byReg.size
    val harm = byReg.values.map(mr => 1L << (55 - mr)).sum +
      zeros * 36028797018963968L
    (zeros, harm)
  }

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
      .map(x => x & ((1L << 60) - 1)).drop(1)

  private def runSequential(hashes: Seq[Long]): Profile.HllOut =
    agg.finish(hashes.foldLeft(agg.zero)(agg.reduce))

  test("finish(reduce-fold) equals the unpivot register-table reference " +
    "on random hash streams, including the rem=0 and all-null edges") {
    for (seed <- 1 to 25) {
      val n = 1 + seed * 37
      val hs = rng(seed.toLong).take(n).toSeq ++
        // force the rem == 0 branch (rank 55) and a null sentinel
        Seq(5L * 18014398509481984L, -1L)
      val got = runSequential(hs)
      val (zeros, harm) = reference(hs)
      assert((got.n_zero_regs, got.harmonic_num) == ((zeros, harm)),
        s"seed $seed")
    }
    val empty = runSequential(Seq(-1L, -1L))
    assert((empty.n_zero_regs, empty.harmonic_num) ==
      ((64L, 64L * 36028797018963968L)))
  }

  test("merge is split-invariant: any chunking of the stream into " +
    "partial states finishes identically to the sequential fold") {
    val hs = rng(99L).take(1000).toSeq
    val sequential = runSequential(hs)
    for (chunks <- Seq(2, 3, 7, 32)) {
      val states = hs.grouped(math.max(1, hs.length / chunks))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      // merge in a deliberately non-insertion order (reversed)
      val merged = states.reverse.reduce { (a, b) =>
        agg.merge(a.clone(), b.clone())
      }
      val got = agg.finish(merged)
      assert((got.n_zero_regs, got.harmonic_num) ==
        ((sequential.n_zero_regs, sequential.harmonic_num)), s"chunks=$chunks")
    }
  }

  test("zero state is the merge identity and duplicates are absorbed " +
    "(the HLL idempotence the estimator relies on)") {
    val hs = rng(7L).take(200).toSeq
    val s = hs.foldLeft(agg.zero)(agg.reduce)
    val withZero = agg.merge(s.clone(), agg.zero)
    assert(agg.finish(withZero) == agg.finish(s.clone()))
    val doubled = runSequential(hs ++ hs)
    assert(agg.finish(s.clone()) == doubled)
  }
}
