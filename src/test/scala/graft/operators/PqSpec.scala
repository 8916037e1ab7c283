package graft.operators

import graft.SparkSpec
import graft.functions.PqExpressions
import org.apache.spark.sql.functions._

/** Product quantization ([[Pq]] + [[graft.functions.PqExpressions]]):
  * codegen/interpreted parity, hostile-input nulls, ADC-vs-exact recall,
  * and the IVF-PQ clustered layout round trip. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated anchor directions in 32-dim; 50 noisy copies of
  // each. PQ discriminates by AVERAGING per-sub-space quantization error
  // across many sub-spaces, so the fixture needs real dimensionality
  // (m=8 sub-spaces of 4 dims); noise is large enough (sigma 0.5) that
  // intra-cluster similarities differ beyond the 4-decimal rounding —
  // otherwise cluster members tie and top-k membership is arbitrary.
  private val Dim = 32

  private def anchor(j: Int): Array[Double] = {
    val r = new scala.util.Random(100 + j)
    val a = Array.fill(Dim)(r.nextGaussian())
    val n = math.sqrt(a.map(x => x * x).sum)
    a.map(_ / n * 5.0)
  }

  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    (0 until 200).map { i =>
      val a = anchor(i % 4)
      (i.toLong, a.map(x => x + rnd.nextGaussian() * 0.5))
    }.toDF("id", "vec").cache()
  }

  private lazy val model = Pq.fit(corpus, "vec", dim = Dim, m = 8, k = 16)

  test("fit tolerates all-zero vectors (filtered, not nulled into KMeans)") {
    // a legal zero vector must not crash the fit: the old nullif-divide
    // nulled array ELEMENTS, which na.drop (row-level) passed straight
    // into array_to_vector → NPE inside the KMeans job
    val withZero = corpus.union(
      Seq((999L, Array.fill(Dim)(0.0).toSeq)).toDF("id", "vec"))
    val m2 = Pq.fit(withZero, "vec", dim = Dim, m = 8, k = 16)
    assert(m2 == model, "zero vector must be excluded from the fit sample")
  }

  test("codebook shape and determinism") {
    assert(model.m == 8 && model.k == 16 && model.subDim == 4)
    val again = Pq.fit(corpus, "vec", dim = Dim, m = 8, k = 16)
    assert(model == again, "same data + seed must fit the identical model")
  }

  test("encode: codegen equals interpreted; wrong-length vectors are null") {
    val enc = Pq.encode(corpus, "vec", model)
    val rows = enc.select($"id", $"vec", $"pq_codes", $"pq_norm").collect()
    assert(rows.length == 200)
    val pe = PqExpressions.PqEncode(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true),
      model.codebooks)
    rows.foreach { r =>
      val vec = r.getSeq[Double](1).toArray
      val interpreted = pe.eval(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vec)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      assert(r.getSeq[Int](2) == interpreted.toSeq,
        s"codegen/interpreted mismatch for id ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) -
        math.sqrt(vec.map(x => x * x).sum)) < 1e-4)
    }
    // hostile: wrong dimensionality encodes to NULL, never a short code
    val bad = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "vec")
    val b = Pq.encode(bad, "vec", model).select("pq_codes").collect().head
    assert(b.isNullAt(0))
    // hostile: a NULL element must yield NULL, not encode the undefined
    // 0.0 the ArrayData getter returns for a null slot (both eval modes)
    val dim = model.codebooks.length * model.codebooks.head.head.length
    val withNull: Seq[java.lang.Double] =
      (0 until dim).map(i => if (i == 2) null else java.lang.Double.valueOf(i * 0.1))
    val nb = Seq((1L, withNull)).toDF("id", "vec")
    assert(Pq.encode(nb, "vec", model).select("pq_codes").collect().head.isNullAt(0))
    val peNullable = PqExpressions.PqEncode(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true),
        nullable = true),
      model.codebooks)
    val nullSlot = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      (0 until dim).map(i => if (i == 2) null else (i * 0.1): java.lang.Double).toArray[Any])
    assert(peNullable.eval(
      org.apache.spark.sql.catalyst.InternalRow(nullSlot)) == null)
  }

  test("ADC: codegen equals a driver-side recompute; hostile codes are null") {
    val q = anchor(0).map(_ * 0.97)
    val table = Pq.distTable(model, q, "dot")
    val enc = Pq.encode(corpus, "vec", model)
    val got = enc
      .select($"id", $"pq_codes",
        PqExpressions.pqAdc($"pq_codes", table).as("adc"))
      .collect()
    got.foreach { r =>
      val codes = r.getSeq[Int](1)
      val want = codes.zipWithIndex.map { case (c, m) => table(m)(c) }.sum
      assert(math.abs(r.getDouble(2) - want) < 1e-12)
    }
    // out-of-range code → null (hostile storage must not read OOB)
    val hostile = Seq((1L, Array(0, 99, 0, 0)), (2L, Array(0, 0, 0))).toDF("id", "pq_codes")
    val h = hostile.select(PqExpressions.pqAdc($"pq_codes", table).as("adc"))
      .collect()
    assert(h.forall(_.isNullAt(0)))
    // a null code SLOT → null, not a lookup of the undefined 0 the
    // ArrayData getter would return
    val m = table.length
    val nullCodes: Seq[java.lang.Integer] =
      (0 until m).map(i => if (i == 1) null else java.lang.Integer.valueOf(0))
    val hn = Seq((1L, nullCodes)).toDF("id", "pq_codes")
      .select(PqExpressions.pqAdc($"pq_codes", table).as("adc")).collect()
    assert(hn.forall(_.isNullAt(0)))
  }

  test("ADC cosine top-k recalls the exact brute-force top-k; refine recovers it exactly") {
    val qr = new scala.util.Random(77)
    val q = anchor(0).map(x => x + qr.nextGaussian() * 0.2)
    val qdf = Seq(Tuple1(q)).toDF("qvec")
    val exact = Similarity.cosineTopK(corpus, "id", "vec", qdf, k = 10)
      .select("id").as[Long].collect().toSet
    val enc = Pq.encode(corpus, "vec", model).cache()
    val adc = Pq.searchCosine(enc, model, "id", q, k = 10)
      .select("id").as[Long].collect().toSet
    // the PQ contract: codes alone discriminate BETWEEN clusters (the
    // cross-cluster similarity gap is far beyond quantization error);
    // fine ranking WITHIN a cluster is what the refine pass is for
    assert(adc.forall(_ % 4 == 0), s"ADC crossed clusters: ${adc.toSeq.sorted}")
    assert((exact & adc).nonEmpty)
    // exact re-rank over a 4x candidate list lifts recall
    val refined = Pq.searchCosine(enc, model, "id", q, k = 10, refine = 4)
      .select("id").as[Long].collect().toSet
    assert((exact & refined).size >= 5,
      s"refined ${refined.toSeq.sorted} vs ${exact.toSeq.sorted}")
    // a refine window covering the whole corpus makes the re-rank EXACT:
    // same kernel, same rounding, same tie order as the brute-force twin
    val full = Pq.searchCosine(enc, model, "id", q, k = 10, refine = 20)
      .select("id").as[Long].collect().toSet
    assert(full == exact, s"full re-rank ${full.toSeq.sorted} vs ${exact.toSeq.sorted}")
    enc.unpersist()
  }

  test("IVF-PQ clustered layout: sidecars round-trip, search prunes to probed cells") {
    val path = java.nio.file.Files.createTempDirectory("graft-pq").toString + "/idx"
    val (ivf, assigned) = IvfIndex.fit(corpus, "vec", nLists = 4)
    Pq.writeClusteredPq(assigned, ivf, model, "vec", path)
    assert(Pq.readModel(path) == model)
    val qr = new scala.util.Random(78)
    val q = anchor(1).map(x => x + qr.nextGaussian() * 0.2)
    val qdf = Seq(Tuple1(q)).toDF("qvec")
    val exact = Similarity.cosineTopK(corpus, "id", "vec", qdf, k = 5)
      .select("id").as[Long].collect().toSet
    val hits = Pq.searchClusteredPq(spark, path, "id", "vec", q,
      k = 5, nProbe = 2, refine = 4)
    assert(hits.count() == 5)
    val got = hits.select("id").as[Long].collect().toSet
    assert(got.forall(_ % 4 == 1), s"IVF-PQ crossed clusters: ${got.toSeq.sorted}")
    assert((exact & got).nonEmpty, s"IVF-PQ recall too low: $got vs $exact")
    // all cells probed + a corpus-wide refine window = exact answer
    val all = Pq.searchClusteredPq(spark, path, "id", "vec", q,
      k = 5, nProbe = 4, refine = 40).select("id").as[Long].collect().toSet
    assert(all == exact, s"exhaustive IVF-PQ ${all.toSeq.sorted} vs ${exact.toSeq.sorted}")
    // the probe filter reaches the file listing: only probed ivf_cell=
    // directories are scanned
    val probes = IvfIndex.readModel(path).nearestCentroids(q, 2).toSet
    val pruned = spark.read.parquet(path)
      .filter(col("ivf_cell").isin(probes.toSeq: _*))
    val files = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, Nil)
          .flatMap(_.files.map(_.getPath.toString))
    }.flatten
    assert(files.nonEmpty && files.forall(p => probes.exists(c => p.contains(s"ivf_cell=$c"))),
      s"unpruned files: $files")
  }

  test("PQ expressions survive multi-instance projections (freshName locals)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val v = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val c = BoundReference(1, ArrayType(IntegerType), nullable = true)
    val book = Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    val table = Seq(Seq(0.5, 1.5), Seq(0.25, 0.75))
    val exprs = Seq(
      PqExpressions.PqEncode(v, book), PqExpressions.PqEncode(v, book),
      PqExpressions.PqAdc(c, table), PqExpressions.PqAdc(c, table))
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(exprs)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(0.9, 1.1, 0.1, 0.0)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1, 0)))
    val out = proj(row)
    assert(out.getArray(0).toIntArray().toSeq == Seq(1, 0))
    assert(math.abs(out.getDouble(2) - (1.5 + 0.25)) < 1e-12)
  }
}
