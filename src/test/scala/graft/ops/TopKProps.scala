package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** Pure-JVM property tests for the bounded top-k UDAF: Spark is free to
  * split groups across partial aggregates arbitrarily, so correctness rests
  * on split-invariance of merge — exactly what ScalaCheck shakes out. */
object TopKProps extends Properties("TopKAggregator") {
  private val agg = new TopKAggregator(3)
  private val pair = Gen.zip(Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L))

  property("matches sort-take reference") = Prop.forAll(Gen.listOf(pair)) { xs =>
    val expect = xs.sortBy { case (s, id) => (-s, id) }.take(3)
    agg.finish(xs.foldLeft(agg.zero)(agg.reduce)) == expect
  }

  property("merge is split-invariant") =
    Prop.forAll(Gen.listOf(pair), Gen.choose(0, 100)) { (xs, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                             r.foldLeft(agg.zero)(agg.reduce))
      agg.finish(whole) == agg.finish(merged)
    }

  property("buffer never exceeds k") = Prop.forAll(Gen.listOf(pair)) { xs =>
    xs.foldLeft(agg.zero)(agg.reduce).size <= 3
  }
}

/** The multimodal stub codec must be a pure function of the bytes. */
object FakeCodecProps extends Properties("FakeCodec") {
  import graft.ops.Multimodal.FakeCodec
  private val bytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  property("probe and features are deterministic") = Prop.forAll(bytes) { b =>
    FakeCodec.probe(b) == FakeCodec.probe(b.clone()) &&
      FakeCodec.features(b).sameElements(FakeCodec.features(b.clone()))
  }

  property("features have fixed dimension") = Prop.forAll(bytes) { b =>
    FakeCodec.features(b).length == FakeCodec.featureDim
  }

  property("frame offsets are bounded and sorted") =
    Prop.forAll(Gen.choose(1, 100), Gen.choose(1, 16)) { (nFrames, k) =>
      val offs = FakeCodec.frameOffsets(nFrames, k)
      offs.size == math.min(nFrames, k) &&
        offs.forall(o => o >= 0 && o < nFrames) && offs == offs.sorted
    }
}

/** The ShingleExplode generator against a pure-Scala sliding-window
  * reference: same distinct n-grams, same first-occurrence order, for any
  * token list and shingle size. */
object ShingleProps extends Properties("ShingleExplode") {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, StringType}
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.ShingleExplode

  // alphabet includes a null (exercises concatWs null-skip) and a
  // space-containing token ("a b" collides with the joined bigram a+b —
  // exercises dedup on the JOINED string, not the window)
  private val tok = Gen.frequency(
    1 -> Gen.const(null: String),
    8 -> Gen.oneOf("a", "b", "c", "ab", "x", "a b"))

  property("matches the sliding-distinct reference") =
    Prop.forAll(Gen.listOf(tok), Gen.choose(1, 4)) { (ts, n) =>
      // reference model: window size counts null positions (the generator
      // slides over array slots), but nulls drop out of the join —
      // concat_ws semantics
      val expect = ts.sliding(n).filter(_.size == n)
        .map(_.filter(_ != null).mkString(" ")).toList.distinct
      val arr = ArrayData.toArrayData(
        ts.map(t => if (t == null) null else UTF8String.fromString(t)).toArray)
      val gen = ShingleExplode(Literal.create(arr, ArrayType(StringType)), n)
      val got = gen.eval(InternalRow.empty).iterator
        .map(_.getUTF8String(0).toString).toList
      got == expect
    }
}
