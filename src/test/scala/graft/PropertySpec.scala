package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.graft.hashing
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks of the custom expression kernels (pure JVM — no
  * Spark jobs, so hundreds of random cases run in milliseconds). Uses
  * scalacheck generators with a fixed seed walk (scalatestplus glue isn't
  * on the classpath).
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var tried = 0
    while (i < n && tried < n * 3) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); i += 1 }
      seed = seed.next
      tried += 1
    }
    assert(i > 0, "generator produced no samples")
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  private def utf8Array(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  test("hyperplaneProbes: home-first, distinct single-bit flips, family-consistent") {
    val vec = Gen.zip(
      Gen.choose(2, 32),
      Gen.choose(Long.MinValue, Long.MaxValue))
      .map { case (dim, s) =>
        // deterministic pseudo-random doubles from the sample seed
        Array.tabulate(dim)(j => ((hashing.mix64(s + j) >>> 11) * 1.1e-16) - 0.45)
      }
    forAll(Gen.zip(vec, Gen.choose(1, 10), Gen.choose(1, 12)), n = 200) {
      case (v, planes, nprobe) =>
        val arr = new GenericArrayData(v.map(x => x: Any))
        val probes = hashing.hyperplaneProbes(arr, planes, nprobe).toLongArray()
        val home = hashing.hyperplaneSig(new GenericArrayData(v.map(x => x: Any)), planes)
        // probe 0 IS the home signature of the same family — the property
        // that lets probe sigs address hyperplaneSig-built indexes
        assert(probes(0) == home)
        assert(probes.length == math.min(nprobe, planes + 1))
        // every extra probe flips exactly one plane bit, all distinct
        probes.drop(1).foreach { p =>
          assert(java.lang.Long.bitCount(p ^ home) == 1, "must be a single-bit flip")
        }
        assert(probes.distinct.length == probes.length, "probes must be distinct")
    }
  }

  test("wordShingleHashes = sorted distinct xxhash64 of string shingles") {
    forAll(Gen.zip(text, Gen.choose(1, 4))) { case (t, n) =>
      val words = t.split(" ", -1)
      val expected = words.sliding(n).filter(_.length == n)
        .map(_.mkString(" "))
        .map(s => hashing.hashUtf8(UTF8String.fromString(s), 42L))
        .toSeq.distinct.sorted
      val got = hashing.wordShingleHashes(UTF8String.fromString(t), n)
        .toLongArray().toSeq
      assert(got == expected)
    }
  }

  test("minhashSigFromHashes agrees with minhashSig on the same shingles") {
    forAll(text, 150) { t =>
      val shingleStrs = t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq.distinct
      val viaStrings = hashing.minhashSig(utf8Array(shingleStrs), 64).toLongArray().toSeq
      val hashes = new GenericArrayData(
        shingleStrs.map(s => hashing.hashUtf8(UTF8String.fromString(s), 42L))
          .distinct.sorted.toArray)
      val viaHashes = hashing.minhashSigFromHashes(hashes, 64).toLongArray().toSeq
      assert(viaStrings == viaHashes)
    }
  }

  test("sortedIntersectionSize = set intersection size") {
    val longs = Gen.listOf(Gen.choose(-50L, 50L))
    forAll(Gen.zip(longs, longs)) { case (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = hashing.sortedIntersectionSize(
        new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
      assert(got == sa.toSet.intersect(sb.toSet).size)
    }
  }

  test("winnowFingerprints ⊆ shingle hashes; global min always kept") {
    forAll(Gen.zip(text, Gen.choose(1, 6))) { case (t, w) =>
      val shingles = hashing.wordShingles(UTF8String.fromString(t), 3)
      val n = shingles.numElements()
      val hashes = (0 until n)
        .map(i => hashing.hashUtf8(shingles.getUTF8String(i), 42L)).toSet
      val fp = hashing.winnowFingerprints(shingles, w).toLongArray().toSet
      if (n == 0) assert(fp.isEmpty)
      else {
        assert(fp.nonEmpty && fp.subsetOf(hashes))
        assert(fp.contains(hashes.min))
      }
    }
  }

  test("TokenProfileCounts = per-profile \\b-alternation regex counts") {
    val profiles = functions.TextFunctions.langProfiles
    val words = profiles.map(_._2.stripPrefix("\\b(").stripSuffix(")\\b").split('|').toSeq)
    val expr = org.apache.spark.sql.graft.TokenProfileCounts(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), words)
    // text mixes profile words, other words, punctuation and digits
    val token = Gen.oneOf(words.flatten ++ Seq("cat", "then", "a1", "_a", "x-y", "42", "!", "die2"))
    val gen = Gen.listOf(token).map(_.mkString(" "))
    forAll(gen, 200) { t =>
      val got = expr.nullSafeEval(UTF8String.fromString(t))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
      val want = profiles.map { case (_, pat) =>
        pat.r.findAllMatchIn(t).length
      }
      assert(got == want, s"text: '$t'")
    }
  }

  test("simhash of identical token multisets is permutation-invariant") {
    forAll(Gen.nonEmptyListOf(word), 150) { ws =>
      val a = hashing.simhash64(utf8Array(ws))
      val b = hashing.simhash64(utf8Array(new scala.util.Random(1).shuffle(ws)))
      assert(a == b)
    }
  }

  test("QuantileHistogram quantiles are monotone and within bounds") {
    val qh = new functions.TypedAggregators.QuantileHistogram(0.0, 100.0, 64)
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 100.0)), 150) { xs =>
      val h = xs.foldLeft(qh.zero)(qh.reduce)
      val qs = Seq(0.1, 0.5, 0.9).map(q => qh.quantile(h, q))
      assert(qs == qs.sorted)
      qs.foreach(v => assert(v >= 0.0 && v <= 100.0))
    }
  }

  test("rollingKgramHashes = direct polynomial over per-token hashes, " +
      "position-faithful, window-local") {
    val sample = Gen.zip(Gen.listOf(word), Gen.choose(1, 8),
      Gen.choose(Long.MinValue, Long.MaxValue))
    forAll(sample, n = 300) { case (toksRaw, k, seed) =>
      // split(" ", -1) semantics: the empty text is ONE empty token
      val toks = if (toksRaw.isEmpty) Seq("") else toksRaw
      val t = UTF8String.fromString(toks.mkString(" "))
      val got = hashing.rollingKgramHashes(t, k, seed).toLongArray()
      val n = toks.length
      if (n < k) assert(got.isEmpty)
      else {
        assert(got.length == n - k + 1)
        // direct (non-rolling) evaluation of the same polynomial: the
        // rolling update must be algebraically exact over Z/2^64
        val b = hashing.mix64(seed) | 1L
        val h = toks.map(w => hashing.hashUtf8(UTF8String.fromString(w), seed))
        val direct = (0 to n - k).map { i =>
          (i until i + k).foldLeft(0L)((acc, j) => acc * b + h(j))
        }
        assert(got.toSeq == direct,
          s"rolling diverged from direct at k=$k, n=$n")
        // window-locality: equal windows hash equal, regardless of
        // position or surrounding context
        for (i <- 0 to n - k; j <- (i + 1) to (n - k))
          if (toks.slice(i, i + k) == toks.slice(j, j + k))
            assert(got(i) == got(j))
      }
    }
  }
}
