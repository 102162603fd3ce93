package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{PqAdcScore, PqAdcTable, PqCodes}

/** ScalaCheck properties of the PQ kernels, pure-JVM (the expression
  * `compute` methods run directly — no Spark jobs):
  *
  * 1. ADC error bound: for unit q and v, adc = ⟨q, c⟩ where c is v's
  *    reconstruction from its chosen centroids, so by Cauchy–Schwarz
  *    |adc − cos(q, v)| = |⟨q, c − u⟩| ≤ ‖c − u‖ — a PROVABLE bound
  *    that must hold for ANY codebooks, not just trained ones.
  * 2. Scale invariance: codes(v) == codes(αv) for α > 0 (cosine has
  *    no magnitude; encode normalizes first).
  * 3. Determinism: repeated encodes agree bit for bit. */
class PqPropertiesSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 24)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val genCase: Gen[(Int, Int, Int, Long)] = for {
    m <- Gen.oneOf(1, 2, 4)
    dsub <- Gen.choose(1, 4)
    ksub <- Gen.choose(1, 5)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (m, dsub, ksub, seed)

  private def rng(seed: Long): () => Double = {
    var s = seed
    () => {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
  }

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("property: ADC score within the reconstruction-residual bound of exact cosine") {
    forAllSeeded(genCase) { case (m, dsub, ksub, seed) =>
      val next = rng(seed)
      val dim = m * dsub
      def vec() = {
        val v = Array.fill(dim)(next())
        if (v.forall(_ == 0.0)) v(0) = 1.0
        v
      }
      val books = Array.fill(m)(Array.fill(ksub)(Array.fill(dsub)(next())))
      val enc = PqCodes(Literal(null), books)
      val tab = PqAdcTable(Literal(null), books)
      val score = PqAdcScore(Literal(null), Literal(null))
      val v = vec()
      val q = vec()
      val codes = enc.compute(new GenericArrayData(v))
      val table = tab.compute(new GenericArrayData(q))
      val adc = score.compute(codes, table)
      val (u, qu) = (unit(v), unit(q))
      val cos = u.zip(qu).map { case (a, b) => a * b }.sum
      // reconstruction c = concatenation of each subspace's chosen centroid
      val c = new Array[Double](dim)
      (0 until m).foreach { j =>
        val cent = books(j)(codes(j) & 0xFF)
        System.arraycopy(cent, 0, c, j * dsub, dsub)
      }
      val resid = math.sqrt(u.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(math.abs(adc - cos) <= resid + 1e-9,
        s"|$adc - $cos| > residual $resid (m=$m dsub=$dsub ksub=$ksub)")
      // the chosen centroid must be the argmin — no closer one exists
      (0 until m).foreach { j =>
        val chosen = books(j)(codes(j) & 0xFF)
        val dChosen = (0 until dsub).map(t => u(j * dsub + t) - chosen(t))
          .map(x => x * x).sum
        books(j).foreach { cent =>
          val d = (0 until dsub).map(t => u(j * dsub + t) - cent(t))
            .map(x => x * x).sum
          assert(dChosen <= d + 1e-12, s"non-minimal centroid chosen in subspace $j")
        }
      }
      // scale invariance + determinism
      val scaled = enc.compute(new GenericArrayData(v.map(_ * 7.5)))
      assert(java.util.Arrays.equals(codes, scaled), "codes must be scale-free")
      assert(java.util.Arrays.equals(codes, enc.compute(new GenericArrayData(v))))
    }
  }
}
