package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-operator identity audits: pairs of operators that compute
  * related statistics through INDEPENDENT constructions must satisfy
  * the textbook identities linking them. This is the guard the q299
  * factor-n slip proved necessary: when a plan, its oracle, and its
  * recount spec all derive from the same algebra, a shared mistake
  * hashes green — an identity against a second construction does not.
  * (The q332 Kendall-W ↔ q299 Friedman identity lives in
  * Round10eSpec; these are the other same-fixture pairs.)
  */
class CrossIdentitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("Mann-Whitney 2U1 equals 2*gt + ties from Cliff's pair counts (exact)") {
    // q229 derives U from doubled rank sums over the value-domain
    // cumulative; q305 counts greater/less/tie pairs via a
    // strict-predecessor cumulative. Same arms, same cents values:
    // 2U1 = 2*#(x>y) + #(x=y) must hold as an INTEGER identity.
    val u = Stats.qMannWhitney(spark, sf).collect()
      .map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
          r.getAs[Long]("two_u1"))).toMap
    val cliff = Stats.qCliffsDelta(spark, sf).collect()
    assert(cliff.length === u.size)
    cliff.foreach { r =>
      val (n1, n2, twoU1) = u(r.getAs[String]("pair"))
      assert(r.getAs[Long]("n1") === n1)
      assert(r.getAs[Long]("n2") === n2)
      assert(twoU1 ===
        2L * r.getAs[Long]("n_gt") + r.getAs[Long]("n_tie"),
        s"pair ${r.getAs[String]("pair")}: 2U1 != 2*gt + tie")
    }
  }

  test("Cronbach's alpha equals Hoyt's ANOVA form 1 - MSE/MSB (q317 vs q330)") {
    // q317 computes alpha from item/total variance combos; q330
    // decomposes the same blocks x years layout into ANOVA sums of
    // squares. Hoyt '41: alpha = 1 - MS_error/MS_blocks.
    val a = Stats.qCronbachAlpha(spark, sf).collect().head
    val v = Stats.qTwoWayAnova(spark, sf).collect().head
    assert(a.getAs[Long]("n_blocks") === v.getAs[Long]("n_blocks"))
    val n = v.getAs[Long]("n_blocks").toDouble
    val msb = v.getAs[Double]("ss_block") / (n - 1.0)
    val mse = v.getAs[Double]("ss_error") / ((n - 1.0) * 2.0)
    val hoyt = 1.0 - mse / msb
    val alpha = a.getAs[Double]("cronbach_alpha")
    assert(math.abs(alpha - hoyt) < 1e-4,
      s"alpha=$alpha vs Hoyt=$hoyt")
  }
}
