package graft.kernels

import org.scalatest.funsuite.AnyFunSuite

/** Entropy kernels: analytic values on constructed series, tie rule,
  * bounds, and the SampEn template-pair convention. */
class EntropySpec extends AnyFunSuite {

  test("permutation entropy: monotone series has a single pattern (PE = 0)") {
    assert(Entropy.permutationEntropy(Array.tabulate(50)(_.toDouble), 3) === 0.0)
    assert(Entropy.permutationEntropy(Array.tabulate(50)(i => -i.toDouble), 3) === 0.0)
  }

  test("permutation entropy: alternating series uses exactly 2 of 6 patterns") {
    val xs = Array.tabulate(60)(i => if (i % 2 == 0) 0.0 else 1.0)
    // patterns alternate between (0,1,0)-shape and (1,0,1)-shape, equal
    // counts -> H = ln 2, normalized ln2/ln6
    val pe = Entropy.permutationEntropy(xs, 3)
    assert(math.abs(pe - math.log(2) / math.log(6)) < 1e-12)
  }

  test("permutation entropy: constant series is one pattern via stable ties") {
    assert(Entropy.permutationEntropy(Array.fill(30)(7.0), 3) === 0.0)
  }

  test("ordinal code: stable ranks match hand computation") {
    // window (2, 2, 1): ranks j0: k1 eq later no, k2: 1<2 -> r0 counts
    // x2<x1? no(eq, k>j) ; x3<x1 yes -> 1; j1: x1<=x2 (eq, k<j) -> 1,
    // x3<x2 -> 1 => 2; j2: x1<=x3 no, x2<=x3 no => 0
    val code = Entropy.ordinalCode(Array(2.0, 2.0, 1.0), 0, 3)
    assert(code === 1 + 3 * 2 + 9 * 0)
  }

  test("sample entropy: periodic series is perfectly regular (SampEn = 0)") {
    val xs = Array.tabulate(40)(i => (i % 4).toDouble)
    // every m-match extends to an (m+1)-match -> A == B -> -ln 1 = 0
    assert(Entropy.sampleEntropy(xs, 2, 0.25) === 0.0)
  }

  test("sample entropy: counts follow the R&M convention on a tiny fixture") {
    // xs = [0, 0, 10, 0, 0]; m=2, r=0.5: 3 templates of len 3:
    // (0,0,10),(0,10,0),(10,0,0). m-pairs within r: (0,0)&(0,0)? ->
    // t1=(0,0),(0,10),(10,0); t2=(0,10)... enumerate: dm pairs:
    // (t1,t2): max(|0-0|,|0-10|)=10 no; (t1,t3): max(10,10) no;
    // (t2,t3): max(10,10) no -> B=0 -> NaN
    assert(Entropy.sampleEntropy(Array(0.0, 0.0, 10.0, 0.0, 0.0), 2, 0.5).isNaN)
    // noisy-but-bounded: irregular series gives positive SampEn
    val rngv = {
      val sc = DetRng.seedConst(5)
      Array.tabulate(80)(i => DetRng.uniform(sc, i.toLong))
    }
    val se = Entropy.sampleEntropy(rngv, 2, 0.3)
    assert(se > 0 && !se.isNaN)
  }

  test("guards") {
    intercept[IllegalArgumentException](Entropy.permutationEntropy(Array(1.0), 3))
    intercept[IllegalArgumentException](Entropy.sampleEntropy(Array(1.0, 2.0), 2, 0.5))
    intercept[IllegalArgumentException](Entropy.sampleEntropy(Array.fill(10)(1.0), 2, -1))
  }
}
