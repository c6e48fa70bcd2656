package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the stubbed decode kernels — in particular
  * the average-hash bit arithmetic the m06 oracle reproduces: strict
  * above-mean compare, stride sampling, and the bit-range contract.
  */
class BinaryDecodeSpec extends AnyFunSuite {

  test("aHash of a two-sample payload sets only the above-mean bit") {
    // samples [1, 3], n=2, sum=4: bit0 1*2>4 false, bit1 3*2>4 true
    val h = BinaryDecode.aHashStub(0L, Array[Byte](1, 3), grid = 32)
    assert(h.n_samples === 2L)
    assert(h.ahash === 2L)
  }

  test("constant payloads hash to zero (strict compare)") {
    val h = BinaryDecode.aHashStub(0L, Array[Byte](5, 5, 5, 5), grid = 32)
    assert(h.ahash === 0L)
  }

  test("long payloads stride-sample to exactly the grid") {
    val bytes = Array.tabulate(1000)(i => (i % 120).toByte)
    val h = BinaryDecode.aHashStub(0L, bytes, grid = 32)
    assert(h.n_samples === 32L)
    // every bit is within the grid range
    assert(h.ahash >= 0L && h.ahash < (1L << 32))
    // and the hash matches a direct recomputation over the same samples
    val stride = math.max(1, bytes.length / 32)
    val samples = (0 until 32).map(j => bytes(j * stride) & 0xff)
    val sum = samples.map(_.toLong).sum
    val expected = samples.zipWithIndex.collect {
      case (s, i) if s.toLong * samples.length > sum => 1L << i
    }.sum
    assert(h.ahash === expected)
  }

  test("codec boundary: a swapped MediaCodec flows through the same " +
      "operator, same schema") {
    val spark = graft.streaming.TestSpark.spark
    import spark.implicits._
    // a "real" codec stand-in that disagrees with the stub on values
    object NegCodec extends MediaCodec {
      override def decode(id: Long, b: Array[Byte]) =
        BinaryDecode.MediaFeatures(id, -b.length.toLong, -1L, 0L, 0L, 0L, 0L)
      override def resize(b: Array[Byte], t: Int) = b.take(1)
      override def perceptualHash(id: Long, b: Array[Byte], g: Int) =
        BinaryDecode.PerceptualHash(id, 1L, 42L)
    }
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](9)))
      .toDF("doc_id", "payload")
    val stub = BinaryDecode.extractFeatures(spark, df).collect()
    val neg = BinaryDecode.extractFeatures(spark, df, NegCodec).collect()
    // identical schema/ids, codec-determined values
    assert(stub.map(_.doc_id).sorted === neg.map(_.doc_id).sorted)
    assert(neg.forall(_.n_bytes < 0) && stub.forall(_.n_bytes > 0))
    assert(BinaryDecode.perceptualHashes(spark, df, 32, NegCodec)
      .collect().forall(_.ahash === 42L))
  }

  test("grid outside [1, 63] is rejected") {
    val spark = graft.streaming.TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2))).toDF("doc_id", "payload")
    intercept[IllegalArgumentException] {
      BinaryDecode.perceptualHashes(spark, df, grid = 64)
    }
  }
}
