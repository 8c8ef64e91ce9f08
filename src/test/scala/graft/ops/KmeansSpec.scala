package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Multi-iteration k-means: Lloyd refinement must (a) monotonically
  * improve the spherical objective (average cosine to the assigned
  * centroid — the k-means guarantee, up to round-6 score quantization) and
  * (b) measurably improve the centroid quantizer for ANN search (recall of
  * one-probe candidate sets against the brute-force ground truth).
  * Measured at sf0.001: objective 0.223 → 0.275 and recall 0.16 → 0.32
  * from iteration 1 to 3. */
class KmeansSpec extends AnyFunSuite with SparkSpec {

  private def objective(asg: org.apache.spark.sql.DataFrame): Double =
    asg.agg(avg(col("score"))).head.getDouble(0)

  /** 1-probe recall: fraction of the brute-force top-5 (queries < 10) that
    * share the query's cell under the given assignment. */
  private def recall(asg: org.apache.spark.sql.DataFrame): Double = {
    val truth = Similarity.qCosineTopK(spark, sfDir).select(col("q_id"), col("vec_id"))
    val cells = asg.select(col("vec_id"), col("cluster"))
    val qcell = cells.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("cluster").as("qc"))
    val hits = truth.join(qcell, "q_id")
      .join(cells.select(col("vec_id"), col("cluster").as("vc")), "vec_id")
      .filter(col("qc") === col("vc")).count()
    hits / 50.0
  }

  test("iterating assign/recompute improves objective and ANN recall") {
    val a1 = Similarity.qKmeans(spark, sfDir, iters = 1)
    val a2 = Similarity.qKmeans(spark, sfDir, iters = 2)
    val a3 = Similarity.qKmeans(spark, sfDir, iters = 3)
    val (o1, o2, o3) = (objective(a1), objective(a2), objective(a3))
    // monotone objective (k-means guarantee; 1e-6 = round-6 quantization)
    assert(o2 >= o1 - 1e-6, s"objective dropped: $o1 -> $o2")
    assert(o3 >= o2 - 1e-6, s"objective dropped: $o2 -> $o3")
    assert(o3 > o1 + 0.01, s"training had no effect: $o1 -> $o3")
    // the trained quantizer beats the label-seeded one for ANN probing
    val (r1, r3) = (recall(a1), recall(a3))
    assert(r3 > r1, s"recall did not improve: $r1 -> $r3")
    // and assignments actually moved between iterations (not a fixpoint)
    assert(a1.select("vec_id", "cluster").exceptAll(a3.select("vec_id", "cluster")).count() > 0)
  }

  /** End-result recall of an ANN query: fraction of the brute-force top-5
    * pairs the approximate result reproduces. */
  private def resultRecall(ann: org.apache.spark.sql.DataFrame): Double = {
    val truth = Similarity.qCosineTopK(spark, sfDir).select(col("q_id"), col("vec_id"))
    ann.select(col("q_id"), col("vec_id"))
      .join(truth, Seq("q_id", "vec_id"), "left_semi").count() / 50.0
  }

  test("the trained quantizer beats the label-seeded one end-to-end (ANN recall)") {
    // equal average probed FRACTION (~0.20 of the corpus), same rerank —
    // quantizer granularity AND probe policy differ: label-seeded fixed-2
    // over 10 cells 0.40 vs Lloyd-trained adaptive over 20 SPLIT-SEEDED
    // cells (margin 0.20, ≤8 probes ≈ 4.0 avg of 20) 0.60 at sf0.001.
    // Finer cells concentrate true neighbors, so the same probed fraction
    // covers more of them (round-8's 10-cell adaptive sat at 0.46).
    val seeded = resultRecall(Similarity.qAnnCentroid(spark, sfDir))
    val trained = resultRecall(Similarity.qAnnKmeans(spark, sfDir))
    assert(trained > seeded, s"training did not help: seeded=$seeded trained=$trained")
    assert(trained > 0.55, s"trained adaptive recall regressed: $trained")
  }

  test("PQ-ADC search from 64x-compressed codes recovers most exact-dot top-5") {
    // ground truth for MIPS (PQ approximates the raw dot, not cosine):
    // exact dot-product top-5 per query over the full vectors
    val e = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d").desc, col("vec_id"))
    val truth = q.crossJoin(broadcast(e)).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.dot(col("qe"), col("embedding")).as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id"))
    val pq = Similarity.qPqTopK(spark, sfDir)
    val rec = pq.select(col("q_id"), col("vec_id"))
      .join(truth, Seq("q_id", "vec_id"), "left_semi").count() / 50.0
    println(s"[pq] reranked recall=$rec")
    // the scan phase reads 10 code bytes/vector instead of 256 raw float
    // bytes (25.6×); the interleaved m=16 3-round codebooks measured 0.80
    // reranked recall at shortlist 20 (round-8's m=8 contiguous: 0.62),
    // and the round-11 shortlist-40 default lifts it further at the SAME
    // compression — the round-10 stretch's ≥0.85 target, met by the
    // shortlist (the lever that moves) rather than the rotation (which
    // measured negative, see the OPQ test below)
    assert(rec >= 0.85, s"PQ recall vs exact dot top-5 regressed: $rec")
    // deterministic: a re-run reproduces the result exactly
    val again = Similarity.qPqTopK(spark, sfDir).collect().map(_.toSeq)
    assert(pq.collect().map(_.toSeq).sameElements(again))
  }

  test("CDC vector index: cell entries follow the vector — assigned, moved on update, retracted on delete") {
    import spark.implicits._
    import org.apache.spark.sql.functions.typedLit
    val work = java.nio.file.Files.createTempDirectory("graft-vecidx-spec-").toString
    // hand-made frozen quantizer: two orthogonal unit centroids
    val cent = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cl", "cvec").withColumn("cnrm", typedLit(1.0))
    def batch(rows: Seq[(Long, Long, String, Seq[Float])]) =
      rows.toDF("id", "seq", "op", "embedding")
    def entries(): Set[(Long, Long)] =
      graft.cdc.ChangelogStream.readState(spark, s"$work/idx", Seq("cell", "id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 0: vector 1 points along centroid 0, vector 2 along centroid 1
    Similarity.maintainVectorIndexBatch(
      batch(Seq((1L, 1L, "INSERT", Seq(1f, 0f)), (2L, 2L, "INSERT", Seq(0.1f, 0.9f)))),
      0L, s"$work/state", s"$work/idx", cent)
    assert(entries() === Set((0L, 1L), (1L, 2L)))
    // batch 1: vector 1's value changes to point along centroid 1 — its
    // entry MOVES cells (old cell-0 entry tombstones, cell-1 entry lives)
    Similarity.maintainVectorIndexBatch(
      batch(Seq((1L, 3L, "UPDATE", Seq(0f, 1f)))),
      1L, s"$work/state", s"$work/idx", cent)
    assert(entries() === Set((1L, 1L), (1L, 2L)))
    // batch 2: vector 2 deleted — its entry retracts
    Similarity.maintainVectorIndexBatch(
      batch(Seq((2L, 4L, "DELETE", Seq(0.1f, 0.9f)))),
      2L, s"$work/state", s"$work/idx", cent)
    assert(entries() === Set((1L, 1L)))
    // replay of batch 2: the identical delta re-absorbs, nothing resurrects
    Similarity.maintainVectorIndexBatch(
      batch(Seq((2L, 4L, "DELETE", Seq(0.1f, 0.9f)))),
      2L, s"$work/state", s"$work/idx", cent)
    assert(entries() === Set((1L, 1L)))
  }

  test("a TRUNCATE batch retracts fence-killed vectors from the maintained index") {
    // fence-carrying batches must keep the hook's killed rows (not batch
    // keys) so their (cell, id) entries retract (r13 self-review #2)
    import spark.implicits._
    import org.apache.spark.sql.functions.typedLit
    val work = java.nio.file.Files.createTempDirectory("graft-vectrunc-spec-").toString
    val cent = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cl", "cvec").withColumn("cnrm", typedLit(1.0))
    def batch(rows: Seq[(Long, Long, String, Seq[Float])]) =
      rows.toDF("id", "seq", "op", "embedding")
    def entries(): Set[(Long, Long)] =
      graft.cdc.ChangelogStream.readState(spark, s"$work/idx", Seq("cell", "id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Similarity.maintainVectorIndexBatch(
      batch(Seq((1L, 1L, "INSERT", Seq(1f, 0f)), (2L, 2L, "INSERT", Seq(0.1f, 0.9f)))),
      0L, s"$work/state", s"$work/idx", cent)
    assert(entries() === Set((0L, 1L), (1L, 2L)))
    // TRUNCATE at seq 10 kills vectors 1 and 2; vector 3 (seq 11) survives
    Similarity.maintainVectorIndexBatch(
      batch(Seq((-1L, 10L, "TRUNCATE", null), (3L, 11L, "INSERT", Seq(0f, 1f)))),
      1L, s"$work/state", s"$work/idx", cent)
    assert(entries() === Set((1L, 3L)))
    // replay re-absorbs
    Similarity.maintainVectorIndexBatch(
      batch(Seq((-1L, 10L, "TRUNCATE", null), (3L, 11L, "INSERT", Seq(0f, 1f)))),
      1L, s"$work/state", s"$work/idx", cent)
    assert(entries() === Set((1L, 3L)))
  }

  test("vector time travel answers from the pre-tail corpus, not the live one") {
    // the seed savepoint pins index AND doc-state versions; the tail
    // (updates reverse vectors, deletes retract them) must move the LIVE
    // ranking away from the pinned one or the pin isn't real
    val pinned = Similarity.qCdcVectorTimeTravel(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val live = Similarity.qCdcVectorBootstrapSearch(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(pinned.nonEmpty)
    assert(pinned !== live,
      "the applied tail should change the live ranking vs the savepoint")
  }

  test("PQ-compressed maintained index: codes in the inverted lists, ADC search holds recall") {
    val (_, idxDir) = Similarity.vectorIndexRun(spark, sfDir)
    // the index state holds PQ codes — NOT raw vectors (the faiss
    // inverted-list layout; compression is real, not cosmetic)
    val entries = graft.cdc.ChangelogStream.readState(spark, idxDir,
      Seq("cell", "id", "codes"))
    assert(entries.count() > 0)
    assert(entries.schema("codes").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.cdc.ChangelogStream.readState(spark, idxDir, Seq("embedding")).collect()
    }
    // every stored code vector has m=16 entries in [0, 32)
    val bad = entries.filter(size(col("codes")) =!= 16 ||
      exists(col("codes"), c => c < 0 || c >= 32)).count()
    assert(bad === 0)
    // an UNCHANGED vector's stored codes equal its staged encoding (the
    // frozen-model discipline: re-encoding reproduces the staged code)
    val staged = Similarity.pqModel(spark, sfDir, 16, 32, 3, interleave = true)._2
    val untouchedStored = entries
      .filter(col("id") % 3 =!= 0 && col("id") % 5 =!= 4)
      .select(col("id").as("vec_id"), posexplode(col("codes")).as(Seq("j", "cl")))
    assert(untouchedStored.count() > 0)
    assert(untouchedStored.exceptAll(
      staged.join(untouchedStored.select("vec_id").distinct(), Seq("vec_id"))
        .select(col("vec_id"), col("j"), col("cl"))).count() === 0)
    // ...and the ADC search over the codes holds recall against the
    // exact-over-candidates rendering (same probed cells, same rerank
    // metric) — the IVF-PQ-level bound the compressed state must keep
    val exact = Similarity.qCdcVectorSearch(spark, sfDir)
      .select(col("q_id"), col("vec_id"))
    val adc = Similarity.qCdcVectorSearchPq(spark, sfDir)
      .select(col("q_id"), col("vec_id"))
    val n = exact.count()
    assert(n > 0)
    val hit = adc.join(exact, Seq("q_id", "vec_id"), "left_semi").count()
    val rec = hit.toDouble / n
    assert(rec >= 0.85, s"ADC-over-codes recall vs exact-over-candidates: $rec")
  }

  test("killing the vector-index pass mid-drain and resuming converges cells AND codes") {
    // the production path's crash story WITH the compressed lists: stop at
    // an arbitrary committed prefix (1 file per epoch), resume from the
    // checkpoint — the doc state re-merges idempotently, every replayed
    // cell delta re-derives identically for the max_by merge to absorb,
    // and the stored codes stay the frozen-model encoding of the live
    // vectors
    val clDir = graft.cdc.Changelog.stageParquetEmbeddings(spark, sfDir)
    val cent = Similarity.ivfCentroids(spark, sfDir, iters = 3, seedSplit = 2)
      .localCheckpoint()
    val book = Similarity.pqModel(spark, sfDir, 16, 32, 3, interleave = true)
      ._1.localCheckpoint()
    val root = java.nio.file.Files.createTempDirectory("graft-vecidx-kill-").toString
    def start() = {
      val stream = spark.readStream.schema(spark.read.parquet(clDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(clDir)
      stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          Similarity.maintainVectorIndexBatch(batch, batchId,
            s"$root/state", s"$root/idx", cent, book)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    val q1 = start()
    q1.awaitTermination(2500)
    q1.stop()
    val q2 = start()
    q2.awaitTermination()
    // the maintained assignment equals quantizing the LIVE vectors against
    // the frozen centroids (re-derived here from the drained doc state)
    val live = graft.cdc.ChangelogStream.readState(spark, s"$root/state",
      Seq("id", "embedding"))
    val expectCells = live
      .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
        Similarity.dot(col("embedding"), col("embedding"))))
      .join(org.apache.spark.sql.functions.broadcast(cent))
      .select(col("id"), col("cl"),
        org.apache.spark.sql.functions.round(
          Similarity.foldDot(col("embedding"), col("cvec")) /
            (col("nrm") * col("cnrm")), 6).as("cscore"))
      .groupBy(col("id"))
      .agg(org.apache.spark.sql.functions.max_by(col("cl"),
        org.apache.spark.sql.functions.struct(col("cscore"),
          (-col("cl")).as("nc"))).as("cell"))
      .select(col("cell"), col("id"))
    val gotEntries = graft.cdc.ChangelogStream.readState(spark, s"$root/idx",
      Seq("cell", "id", "codes"))
    assert(gotEntries.select("cell", "id").exceptAll(expectCells).count() === 0)
    assert(expectCells.exceptAll(gotEntries.select("cell", "id")).count() === 0)
    // ...and every stored code vector equals the frozen-model encoding of
    // its live vector (kill/replay cannot leave stale codes behind)
    val expectCodes = Similarity.pqEncode(
      live.select(col("id").as("vec_id"), col("embedding")), book, 16)
      .select(col("vec_id").as("id"), col("codes"))
    assert(gotEntries.select("id", "codes").exceptAll(expectCodes).count() === 0)
  }

  test("OPQ rotation, measured: parametric OPQ cannot beat the fixed interleave on this corpus") {
    // the round-10 stretch, run honestly: a LEARNED subspace decomposition
    // (parametric OPQ — PCA rotation + eigenvalue allocation, the
    // closed-form solution) against the fixed interleave permutation, both
    // at m=16/k=32/shortlist 20 against the exact-dot top-5. On this
    // near-isotropic corpus (eigen-spread ~4×) the rotation has nothing to
    // align: measured 0.80 (OPQ) vs 0.80 (interleave) — an exact tie —
    // quantization error binds, not subspace correlation, so the engine
    // spends the recall budget on the ADC shortlist instead (qPqTopK's
    // default).
    // This test pins the measurement: the rotated variant must WORK (far
    // above the 0.31 expected of a random candidate cut) while not
    // beating interleave by enough to justify a learned-rotation stage.
    val e = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d").desc, col("vec_id"))
    val truth = q.crossJoin(broadcast(e)).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.dot(col("qe"), col("embedding")).as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id"))
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select(col("q_id"), col("vec_id"))
        .join(truth, Seq("q_id", "vec_id"), "left_semi").count() / 50.0
    val opq = recallOf(Similarity.qPqTopKRotated(spark, sfDir, shortlist = 20))
    val intl = recallOf(Similarity.qPqTopK(spark, sfDir, shortlist = 20))
    println(s"[opq] rotated recall=$opq interleave recall=$intl")
    assert(opq > 0.5, s"rotated PQ is broken, not merely unhelpful: $opq")
    assert(opq <= intl + 0.1,
      s"OPQ now BEATS interleave ($opq vs $intl) — revisit the default")
    // the rotation is genuinely orthogonal (exact dots preserved): R·Rᵀ=I
    val r = Similarity.opqRotation(spark, sfDir, 16)
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => r(i)(t) * r(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"R not orthogonal at ($i,$j): $dot")
    }
  }

  test("IVF-PQ: cell-pruned compressed search holds recall at a bounded probed fraction") {
    // ground truth for MIPS, as the PQ test: exact dot top-5 per query
    val e = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d").desc, col("vec_id"))
    val truth = q.crossJoin(broadcast(e)).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Similarity.dot(col("qe"), col("embedding")).as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id"))
    val ivfpq = Similarity.qAnnIvfPq(spark, sfDir)
    val rec = ivfpq.select(col("q_id"), col("vec_id"))
      .join(truth, Seq("q_id", "vec_id"), "left_semi").count() / 50.0
    // probed FRACTION: candidate (query, vector) pairs per query over the
    // corpus — what the pruned scan actually touches, codes-only
    val asg = Similarity.ivfAssignments(spark, sfDir, 6, 6)
    val cells = asg.filter(col("crk") === 1)
      .select(col("vec_id"), col("cl").as("cell"))
    val probed = asg.filter(col("vec_id") < 10 &&
        (col("crk") === 1 ||
          (col("crk") <= 14 && col("cscore") >= col("best") - 0.60)))
      .select(col("vec_id").as("q_id"), col("cl").as("cell"))
    val n = e.count()
    val frac = probed.join(cells, "cell").count() / (10.0 * n)
    println(s"[ivfpq] recall=$rec probed_fraction=$frac")
    assert(frac <= 0.25, s"probed fraction exceeds the budget: $frac")
    // r13 operating point (60 cells / 14 probes): 0.74 at sf0.001 — the
    // r12 ceiling (0.70) was a 30-cell artifact, not a corpus property
    assert(rec >= 0.72, s"IVF-PQ recall regressed: $rec at fraction $frac")
  }

  test("vector bootstrap: snapshot-seeded code lists + tail equal the replay-built index") {
    // the bootstrap pass (source-table seed in one maintainVectorIndexBatch
    // build + only the update/delete tail) must converge to the SAME
    // (cell, id) assignment and answer searches identically to the
    // replay-built pass — bootstrap(index) ≡ replay(index)
    val (_, bootIdx) = Similarity.vectorIndexBootstrapRun(spark, sfDir)
    val boot = graft.cdc.ChangelogStream
      .readState(spark, bootIdx, Seq("cell", "id", "codes"))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getSeq[Long](2)))
    // codes present for every live entry (the seeded batch PQ-encoded
    // against the frozen staged codebooks exactly as arriving ones do)
    assert(boot.nonEmpty && boot.forall(_._3 != null))
    val replay = Similarity.qCdcVectorIndex(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(boot.map(t => (t._1, t._2)).toSet === replay)
    val a = Similarity.qCdcVectorBootstrapSearch(spark, sfDir).collect().toSeq
    val b = Similarity.qCdcVectorSearch(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("SQ8: the int8 round-trip reranks to near-exact recall, and the " +
    "approximate-then-rerank page matches brute force where it should (r19)") {
    val exact = Similarity.qCosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    val sq8 = Similarity.qSq8TopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
    assert(sq8.keySet === exact.keySet)
    val recall = exact.keys.toSeq.map(q =>
      (sq8(q) intersect exact(q)).size.toDouble / exact(q).size).sum / exact.size
    assert(recall >= 0.9,
      f"SQ8 recall $recall%.2f below 0.9 — the 255-level grid should rerank near-exact")
  }
}
