package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pca

/** Properties of the PCA train/project pair: recovered axes on planted
  * anisotropic data, orthonormality, rotation-invariance at k = d,
  * whitening variance, layout independence, and the fail-fast edges.
  */
class PcaPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-noise in [-0.5, 0.5) from (row, dim). */
  private def noise(i: Int, j: Int): Double =
    (((i * 2654435761L + j * 40503L) & 0xffff).toDouble / 65536.0) - 0.5

  /** Planted anisotropic corpus in d = 6: variance ~9 along e0,
    * ~1 along e1, ~0.01 noise elsewhere, mean shifted to (5, -3, 0...).
    */
  private def planted(n: Int) = {
    val rows = (0 until n).map { i =>
      val a = 3.0 * math.sin(i * 0.7)   // big axis, amplitude ~3
      val b = 1.0 * math.cos(i * 1.3)   // small axis, amplitude ~1
      val v = Array.tabulate(6) { j =>
        0.1 * noise(i, j) +
          (if (j == 0) 5.0 + a else if (j == 1) -3.0 + b else 0.0)
      }
      (i.toLong, v)
    }
    rows.toDF("id", "vec")
  }

  test("recovers planted axes: components orthonormal, variance descending, e0 first") {
    val df = planted(4000)
    val m = Pca.pcaTrain(df, "vec", k = 3)
    assert(m.d == 6 && m.k == 3)
    // descending explained variance, dominated by the planted axes
    assert(m.explainedVariance(0) > m.explainedVariance(1) &&
      m.explainedVariance(1) > m.explainedVariance(2),
      m.explainedVariance.mkString(","))
    assert(m.explainedVariance(0) > 3.0 && m.explainedVariance(1) > 0.3)
    // first component aligns with e0, second with e1 (sign-fixed positive)
    assert(m.components(0)(0) > 0.99, s"c0 = ${m.components(0).mkString(",")}")
    assert(m.components(1)(1) > 0.99, s"c1 = ${m.components(1).mkString(",")}")
    // mean recovered
    assert(math.abs(m.mean(0) - 5.0) < 0.2 && math.abs(m.mean(1) + 3.0) < 0.2)
    // orthonormal
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"c$a · c$b = $dot")
    }
  }

  test("k = d projection is a rigid rotation: pairwise distances preserved") {
    val df = planted(500)
    val m = Pca.pcaTrain(df, "vec", k = 6)
    val out = Pca.pcaProject(df, "vec", m)
      .select($"id", $"vec", $"pca").as[(Long, Array[Double], Array[Float])]
      .collect().sortBy(_._1)
    def dist(x: Array[Double], y: Array[Double]): Double =
      math.sqrt(x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum)
    for (i <- 0 until 20; j <- (i + 1) until 20) {
      val dv = dist(out(i)._2, out(j)._2)
      val dp = dist(out(i)._3.map(_.toDouble), out(j)._3.map(_.toDouble))
      assert(math.abs(dv - dp) < 1e-3, s"pair ($i,$j): $dv vs $dp")
    }
  }

  test("whitened projection has ~unit variance per retained component") {
    val df = planted(4000)
    val m = Pca.pcaTrain(df, "vec", k = 2)
    val rows = Pca.pcaProject(df, "vec", m, whiten = true)
      .select($"pca").as[Array[Float]].collect()
    for (dim <- 0 until 2) {
      val xs = rows.map(_(dim).toDouble)
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(v - 1.0) < 0.05, s"whitened var(dim $dim) = $v")
    }
  }

  test("layout independence: repartitioned corpora agree to reduction-order tolerance") {
    val df = planted(3000)
    val a = Pca.pcaTrain(df.repartition(3), "vec", k = 2)
    val b = Pca.pcaTrain(df.repartition(11), "vec", k = 2)
    for (r <- 0 until 2; i <- 0 until 6)
      assert(math.abs(a.components(r)(i) - b.components(r)(i)) < 1e-8,
        s"component ($r,$i) diverged across layouts")
  }

  test("fail-fast edges: ragged width, projection width mismatch, empty input, bad k") {
    val df = planted(100)
    val ragged = df.select($"id",
      when($"id" === 50L, slice($"vec", 1, 3)).otherwise($"vec").as("vec"))
    val e1 = intercept[Exception] { Pca.pcaTrain(ragged, "vec", k = 2) }
    assert(e1.getMessage != null && e1.getMessage.contains("ragged"),
      s"got: ${e1.getMessage}")
    val m = Pca.pcaTrain(df, "vec", k = 2)
    val e2 = intercept[Exception] {
      Pca.pcaProject(df.select($"id", slice($"vec", 1, 3).as("vec")), "vec", m)
        .collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("model expects"),
      s"got: ${e2.getMessage}")
    val e3 = intercept[IllegalArgumentException] {
      Pca.pcaTrain(df.where(lit(false)), "vec", k = 1)
    }
    assert(e3.getMessage.contains("no non-null vectors"))
    intercept[IllegalArgumentException] { Pca.pcaTrain(df, "vec", k = 0) }
    intercept[IllegalArgumentException] { Pca.pcaTrain(df, "vec", k = 7) }
    // null vector rows are skipped in training, project to null
    val withNull = df.select($"id",
      when($"id" === 3L, lit(null).cast("array<double>")).otherwise($"vec").as("vec"))
    val mn = Pca.pcaTrain(withNull, "vec", k = 1)
    assert(mn.d == 6)
    val projected = Pca.pcaProject(withNull, "vec", mn)
      .where($"id" === 3L).select($"pca").collect()
    assert(projected.length == 1 && projected(0).isNullAt(0))
  }
}
