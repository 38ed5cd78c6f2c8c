package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Pipeline, TextAnalysis}

/** Invariant checks for the pipeline-mechanics operators (p01/p02)
  * and the vocabulary/redaction text ops (t06/t07).
  */
class PipelineSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = TestSpark.spark

  test("p01 split is deterministic and roughly 90/5/5") {
    val a = Pipeline.p01SplitAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val b = Pipeline.p01SplitAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(a.sameElements(b), "split must be a pure function of doc_id")
    val frac = a.groupBy(_._2).view.mapValues(_.length.toDouble / a.length).toMap
    assert(frac("train") > 0.8 && frac("train") < 0.97, s"train frac $frac")
    assert(frac.getOrElse("val", 0.0) + frac.getOrElse("test", 0.0) > 0.03, s"holdout $frac")
  }

  test("p02 packing is gap-free and contiguous within each shard") {
    val rows = Pipeline.p02PackChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._1)
      var expectedOffset = 0L
      ordered.foreach { case (doc, _, nTok, start, chunk) =>
        assert(start == expectedOffset, s"shard $shard doc $doc: offset $start != $expectedOffset")
        assert(chunk == start / 2048L, s"shard $shard doc $doc: chunk $chunk")
        expectedOffset += nTok
      }
    }
    assert(rows.map(_._5).max > 0, "corpus should span multiple chunks")
  }

  test("p05 profile: one scan, truth values on a known frame") {
    import spark.implicits._
    // plan shape: profiling all 5 columns must read the parquet ONCE
    // (melt-then-aggregate), never once per column
    val plan = Pipeline.p05Profile(spark, sfDir).queryExecution.executedPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected 1 parquet scan, got ${scans.size}")
    // value truth against the real table, brute-forced in memory
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
    val byCol: Map[String, Array[String]] = Map(
      "doc_id" -> docs.map(r => String.valueOf(r.getLong(0))),
      "text" -> docs.map(_.getString(1)),
      "lang" -> docs.map(_.getString(2)),
      "source" -> docs.map(_.getString(3)),
      "n_chars" -> docs.map(r => String.valueOf(r.getLong(4))))
    val got = Pipeline.p05Profile(spark, sfDir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))
    }.toMap
    assert(got.keySet == byCol.keySet)
    byCol.foreach { case (cname, vals) =>
      val nonNull = vals.filter(_ != null)
      val (nRows, nNull, nDistinct, minLen, maxLen, avgLen) = got(cname)
      assert(nRows == vals.length, s"$cname n_rows")
      assert(nNull == vals.count(_ == null), s"$cname n_null")
      assert(nDistinct == nonNull.distinct.length, s"$cname n_distinct")
      assert(minLen == nonNull.map(_.length).min, s"$cname min_len")
      assert(maxLen == nonNull.map(_.length).max, s"$cname max_len")
      val want = BigDecimal(nonNull.map(_.length.toDouble).sum / nonNull.length)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(avgLen - want) < 1e-9, s"$cname avg_len $avgLen != $want")
    }
  }

  test("t06 redaction removes exactly the digit characters") {
    val rows = TextAnalysis.t06RedactIds(spark, sfDir).collect()
      .map(r => (r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (name, redacted, nIds) =>
      assert(!redacted.exists(_.isDigit), s"'$redacted' still has digits")
      assert(redacted.length == name.length, "redaction must preserve length")
      assert(nIds == name.count(_.isDigit), s"'$name' id-char count")
      assert(redacted.zip(name).forall { case (r, n) => r == n || (n.isDigit && r == 'X') })
    }
  }

  test("t07 vocabulary df/tf/idf are mutually consistent") {
    val rows = TextAnalysis.t07Vocab(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sfDir).count()
    rows.foreach { case (tok, tf, df, idf) =>
      assert(tf >= df, s"$tok: tf $tf < df $df")
      assert(df <= nDocs, s"$tok: df $df > corpus $nDocs")
      val expected = math.log((nDocs + 1.0) / (df + 1.0))
      assert(math.abs(idf - expected) < 5e-5, s"$tok: idf $idf vs $expected")
    }
    // sorted by df descending
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("p07 downsamples the BIG sources and keeps the smallest whole") {
    // the alpha-sampling direction: kept_i ∝ n_i^alpha means the
    // keep-RATE falls as source size grows — an inverted formula
    // (rate rising with size) amplifies skew instead of compressing
    // it. The shipped corpus has UNIFORM source sizes (rates all
    // 65536 — direction unobservable), so stage a skewed one:
    // 400/100/25 docs give exact power-of-4 ratios and rate ticks
    // 16384/32768/65536 under alpha = 0.5.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-p07").toString
    ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.p07MixTemperature(spark, dir)
      .select("source", "n_source", "rate_ticks", "kept").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val bySource = rows.groupBy(_._1).map { case (s, g) =>
      (s, g.head._2, g.head._3, g.count(_._4)) }.toSeq.sortBy(_._2)
    assert(bySource.map(_._2).distinct.length > 1, "sources must differ in size")
    // smallest source: rate exactly 65536 ticks = kept whole
    assert(bySource.head._3 == 65536L && bySource.head._4 == bySource.head._2,
      s"smallest source must be kept whole: ${bySource.head}")
    // rate_ticks non-increasing as n_source grows
    assert(bySource.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      s"keep rate must fall with source size: $bySource")
    // kept counts follow n^alpha: the largest source keeps close to
    // sqrt(n_min * n_max) docs (md5 noise aside)
    val big = bySource.last
    val expect = math.sqrt(bySource.head._2.toDouble * big._2.toDouble)
    assert(math.abs(big._4 - expect) / expect < 0.25,
      s"largest source kept ${big._4}, expected ~$expect")
  }

  test("p09 repeats SMALL sources and trains the largest exactly once") {
    // the epoch direction: epochs_i = (n_max/n_i)^(1-alpha) must RISE
    // as source size falls (the upsampling mirror of p07). Shipped
    // corpus sources are uniform (everyone exactly 1 copy — direction
    // unobservable), so stage the p07 skew: 400/100/25 docs → e_ticks
    // 256/512/1024 exactly under alpha = 0.5 (power-of-4 ratios).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-p09").toString
    ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Pipeline.p09EpochRepeats(spark, dir)
      .select("doc_id", "source", "e_ticks", "copy").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySource = rows.groupBy(_._2)
    assert(bySource("big").forall(_._3 == 256L), "largest source: 1.0 epochs")
    assert(bySource("mid").forall(_._3 == 512L), "4x smaller: 2.0 epochs")
    assert(bySource("small").forall(_._3 == 1024L), "16x smaller: 4.0 epochs (clamped path exact)")
    // whole-number epochs here, so copy counts are exact, no md5 noise
    assert(bySource("big").length == 400, "each big doc exactly once")
    assert(bySource("mid").length == 200, "mid docs exactly twice")
    assert(bySource("small").length == 100, "small docs exactly 4x")
    // copies enumerate 1..n per doc
    val copies = rows.filter(_._2 == "small").groupBy(_._1).values
    assert(copies.forall(c => c.map(_._4).sorted.sameElements(1L to c.length)))
  }

  test("p06 strata are score-monotone quartiles with rate-ordered keeps") {
    val rows = Pipeline.p06StratifiedSample(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.length == 500)
    val byStratum = rows.groupBy(_._3)
    assert(byStratum.keySet == Set(0, 1, 2, 3), "all four strata populated")
    // stratum assignment is monotone in score: no doc in a lower
    // stratum outscores any doc in a higher one
    (0 to 2).foreach { s =>
      assert(byStratum(s).map(_._2).max <= byStratum(s + 1).map(_._2).min,
        s"stratum $s overlaps stratum ${s + 1}")
    }
    // exact-percentile cutpoints ⇒ quartiles within tie-slack of n/4
    byStratum.values.foreach(g =>
      assert(g.length > 75 && g.length < 175, s"degenerate stratum size ${g.length}"))
    // keep fraction rises with quality (10/25/50/100 targets, md5 noise)
    val kf = (0 to 3).map(s => byStratum(s).count(_._4).toDouble / byStratum(s).length)
    assert(kf.sliding(2).forall(p => p(0) <= p(1) + 0.05), s"keep fractions not rising: $kf")
    assert(kf(3) == 1.0, "top stratum keeps everything")
    assert(kf(0) < 0.25, s"bottom stratum must be heavily downsampled: ${kf(0)}")
  }

  test("p12 curriculum: dense schedule, annealed phases, sources interleaved") {
    val rows = Pipeline.p12Curriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // seq is a dense 1..N permutation of the whole corpus
    val n = Tables.documents(spark, sfDir).count()
    assert(rows.length == n)
    assert(rows.map(_._4).sorted.sameElements(1L to n))
    assert(rows.map(_._1).distinct.length == rows.length)
    // phases anneal: stratum is non-decreasing along the schedule
    val bySeq = rows.sortBy(_._4)
    assert(bySeq.map(_._2).sliding(2).forall(p => p.head <= p.last),
      "stratum must never decrease along the schedule")
    // round-robin inside a phase: walking a stratum in schedule order,
    // block b (the b-th pass over the sources) holds exactly the
    // sources that still have a b-th document, each once — so no batch
    // is source-correlated until a source runs dry
    bySeq.groupBy(_._2).foreach { case (stratum, docs) =>
      val inOrder = docs.sortBy(_._4).map(_._3)
      val srcCounts = inOrder.groupBy(identity).view.mapValues(_.size).toMap
      var idx = 0
      var block = 1
      while (idx < inOrder.length) {
        val expect = srcCounts.filter(_._2 >= block).keys.toSeq.sorted
        val got = inOrder.slice(idx, idx + expect.length)
        assert(got.sameElements(expect),
          s"stratum $stratum block $block: $got != $expect")
        idx += expect.length
        block += 1
      }
    }
    // deterministic: a second run is identical
    val again = Pipeline.p12Curriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(again.sameElements(rows))
  }

  test("p14 chunk geometry: exact starts on boundary-length synthetic docs") {
    import spark.implicits._
    val (s, st) = (128, 96)
    // lengths straddling every geometry boundary: sub-window, exact
    // window, one-over, stride-aligned tail, one-over-stride, double
    val lens = Seq(1, 127, 128, 129, 224, 225, 320)
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = Pipeline.chunkAddressesFor(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._3, c._4)).toSeq).toMap
    def expected(n: Int): Seq[(Long, Long)] = {
      val nf = if (n > s) (n - s + st - 1) / st else 0
      val starts = (0 until nf).map(_.toLong * st) :+ math.max(n - s, 0).toLong
      starts.map(a => (a, math.min(a + s, n).toLong))
    }
    lens.zipWithIndex.foreach { case (n, i) =>
      assert(got(i.toLong) == expected(n), s"doc of $n tokens: ${got(i.toLong)}")
    }
    // coverage + overlap invariants on the longest doc: every token
    // covered, consecutive chunks overlap by exactly the configured
    // overlap except possibly the right-aligned final
    val chunks = got(lens.indexOf(320).toLong)
    assert(chunks.head._1 == 0 && chunks.last._2 == 320)
    chunks.sliding(2).foreach { case Seq((_, e1), (s2, _)) =>
      assert(s2 < e1, "consecutive chunks must overlap")
    }
  }

  test("p13 yield funnel matches a brute-force plain-Scala recount") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    def toks(t: String) = t.toLowerCase.split("[ \n\t\r]+").filter(_.nonEmpty)
    val withT = docs.map { case (id, lang, text, nc) => (id, lang, text, nc, toks(text)) }
    val s2 = withT.filter(_._2 == "en")
    val s3 = s2.filter(_._4 >= 100)
    // prefix dedup among stage-3 survivors: min doc_id per 80-char head
    val keep = s3.groupBy(d => md5hex(d._3.take(80))).values.map(_.map(_._1).min).toSet
    val s4 = s3.filter(d => keep(d._1))
    val s5 = s4.filter(d => 10 * d._5.distinct.length >= 3 * d._5.length)
    val stages = Seq(docs.map(d => (d._1, toks(d._3))), s2.map(d => (d._1, d._5)),
      s3.map(d => (d._1, d._5)), s4.map(d => (d._1, d._5)), s5.map(d => (d._1, d._5)))
    val expected = stages.zipWithIndex.map { case (s, i) =>
      (i + 1, s.length.toLong, s.map(_._2.length.toLong).sum,
        math.rint(s.length.toDouble * 100.0 / docs.length * 100) / 100)
    }
    val got = Pipeline.p13YieldReport(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"funnel mismatch: $got vs $expected")
    // the funnel is monotone non-increasing
    assert(got.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("p15 eval report matches a hand count of t19's predictions") {
    val preds = TextAnalysis.t19NaiveBayes(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getString(2))
    val rep = Pipeline.p15EvalReport(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val classes = (preds.map(_._1) ++ preds.map(_._2)).distinct.sorted
    assert(rep.keySet == classes.toSet)
    classes.foreach { c =>
      val (na, np, tp) = rep(c)
      assert(na == preds.count(_._1 == c), s"n_actual drift for $c")
      assert(np == preds.count(_._2 == c), s"n_predicted drift for $c")
      assert(tp == preds.count(p => p._1 == c && p._2 == c), s"tp drift for $c")
    }
    // micro identities: tp totals = corpus correct count; every doc
    // is predicted exactly once, so n_predicted sums to the corpus
    val correct = preds.count(p => p._1 == p._2).toLong
    assert(rep.values.map(_._3).sum == correct)
    assert(rep.values.map(_._2).sum == preds.length.toLong)
  }

  test("p16: indexer rank order, bucketizer splits, z-score centering") {
    import graft.operators.Pipeline
    val rows = Pipeline.p16FeatureEncode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nSrc = rows.head.getLong(3)
    // StringIndexer contract: indices are exactly 0..n_sources-1, and
    // a more frequent source never gets a larger index than a rarer one
    val bySrc = rows.groupBy(_.getString(1))
      .map { case (s, rs) => (s, rs.head.getLong(2), rs.length) }
    assert(bySrc.map(_._2).toSeq.sorted == (0L until nSrc).toSeq)
    for (a <- bySrc; b <- bySrc if a._3 > b._3)
      assert(a._2 < b._2, s"freq order violated: $a vs $b")
    // Bucketizer contract: fixed splits on n_chars
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val nc = docs(r.getLong(0))
      val want = if (nc < 200) 0L else if (nc < 400) 1L else if (nc < 800) 2L else 3L
      assert(r.getLong(4) == want)
    }
    // StandardScaler contract: tick z-scores center near 0 and their
    // RMS sits near the 2^10 tick scale (unit variance)
    val z = rows.map(_.getLong(5).toDouble)
    assert(math.abs(z.sum / z.length) <= 1.0, s"mean ${z.sum / z.length}")
    val rms = math.sqrt(z.map(v => v * v).sum / z.length)
    assert(rms > 900 && rms < 1150, s"rms $rms off the 1024 tick scale")
  }

  test("p17: ROC endpoints, monotone curve, and brute-force midrank AUC") {
    import graft.operators.{Pipeline, TextAnalysis}
    val rows = Pipeline.p17RocAuc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val p = rows.map(_.getLong(1)).sum
    val nn = rows.map(_.getLong(2)).sum
    // endpoints: the lowest threshold predicts everything positive
    assert(rows.head.getLong(3) == p && rows.head.getLong(4) == nn)
    // cum tp/fp are non-increasing in bin (descending cumulative)
    val tps = rows.map(_.getLong(3)); val fps = rows.map(_.getLong(4))
    assert(tps.zip(tps.tail).forall { case (a, b) => b <= a })
    assert(fps.zip(fps.tail).forall { case (a, b) => b <= a })
    // AUC: brute-force midrank Mann-Whitney over the binned scores
    val bins = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val u2brute = bins.map { case (b, pos, _) =>
      val negBelow = bins.filter(_._1 < b).map(_._3).sum
      val negAt = bins.find(_._1 == b).get._3
      pos * (2 * negBelow + negAt)
    }.sum
    assert(rows.head.getLong(7) == u2brute)
    assert(rows.map(_.getLong(7)).distinct.length == 1)
    val auc = rows.head.getLong(8)
    assert(auc >= 0L && auc <= 1048576L)
    assert(auc == (u2brute * 1048576L) / (2L * p * nn))
    // deterministic
    assert(rows.toSeq == Pipeline.p17RocAuc(spark, sfDir).collect().toSeq)
  }

  test("p18: regression metrics match a brute-force in-memory rescore") {
    import graft.operators.Relational
    val rows = Pipeline.p18RegressionEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // truth: collect the SAME on-grid frame and coefficients, redo
    // the quantize-then-sum arithmetic exactly (identical IEEE ops)
    val base = Relational.ridgeBase(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(2),
        Array(r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
    val model = graft.operators.Recommend
      .solveSide(Relational.ridgeBase(spark, sfDir), "l_returnflag")
      .collect().map { r =>
        val n = r.schema.fieldNames.zipWithIndex.toMap
        r.getString(n("l_returnflag")) ->
          (0 to 3).map(k => r.getDouble(n(s"f$k"))).toArray
      }.toMap
    val truth = base.groupBy(_._1).map { case (g, rs) =>
      val c = model(g)
      val q = rs.map { case (_, r, f) =>
        val pred = c(0) * f(0) + c(1) * f(1) + c(2) * f(2) + c(3) * f(3)
        val res = r - pred
        (math.floor(res * 4096.0 + 0.5).toLong,
          math.floor(res * 64.0 + 0.5).toLong,
          math.floor(r * 64.0 + 0.5).toLong,
          math.floor(pred * 64.0 + 0.5).toLong)
      }
      val n = q.length.toLong
      val sae12 = q.map(t => math.abs(t._1)).sum
      val sse6 = q.map(t => t._2 * t._2).sum
      val sy6 = q.map(_._3).sum; val syy6 = q.map(t => t._3 * t._3).sum
      val sp6 = q.map(_._4).sum; val spp6 = q.map(t => t._4 * t._4).sum
      g -> (n, (sae12 * 256) / n, (sse6 * 256) / n,
        1048576L - (sse6 * 1048576L) / ((n * syy6 - sy6 * sy6) / n),
        (((n * spp6 - sp6 * sp6) / n) * 256) / n)
    }
    rows.foreach { r =>
      val (n, mae, mse, r2, evar) = truth(r.getString(0))
      info(s"group ${r.getString(0)}: n=$n mae=$mae mse=$mse r2=$r2 evar=$evar")
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == mae, s"mae ${r.getLong(2)} != $mae")
      assert(r.getLong(3) == mse, s"mse ${r.getLong(3)} != $mse")
      assert(r.getLong(4) == r2, s"r2 ${r.getLong(4)} != $r2")
      assert(r.getLong(5) == evar, s"evar ${r.getLong(5)} != $evar")
      // R^2 <= 1 always; it CAN be negative here — this corpus's
      // price is independent of the features (OLS R^2 ~ 4e-4), so
      // the ridge-shrunk intercept predicts below the mean and SSE
      // edges past SST (the standard out-of-model R^2 semantics)
      assert(r.getLong(4) <= 1048576L, s"r2_ticks ${r.getLong(4)} > 2^20")
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L && r.getLong(5) >= 0L)
    }
    assert(rows.toSeq ==
      Pipeline.p18RegressionEval(spark, sfDir).collect().toSeq)
  }

  test("p20: draws are partition-invariant, in-range, and statistically sane") {
    val rows = Pipeline.p20RandomFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length
    assert(n > 0)
    // uniform range is exactly the 20-bit slice
    rows.foreach { case (_, u, _) => assert(u >= 0L && u < 1048576L) }
    // Irwin-Hall range: |z| <= 6 * 2^20
    rows.foreach { case (_, _, z) => assert(math.abs(z) <= 6L * 1048576L) }
    // mean of u within 4 sigma of 2^19 (sigma = 2^20/sqrt(12n))
    val uMean = rows.map(_._2.toDouble).sum / n
    val uSig = 1048576.0 / math.sqrt(12.0 * n)
    assert(math.abs(uMean - 524288.0) < 4 * uSig, s"u mean $uMean")
    // z: mean near 0 (sigma_mean = 2^20/sqrt(n)), variance near 2^40
    val zMean = rows.map(_._3.toDouble).sum / n
    assert(math.abs(zMean) < 4 * 1048576.0 / math.sqrt(n), s"z mean $zMean")
    val zVar = rows.map(t => t._3.toDouble * t._3.toDouble).sum / n
    val v0 = 1048576.0 * 1048576.0
    assert(zVar > 0.8 * v0 && zVar < 1.2 * v0, s"z var ratio ${zVar / v0}")
    // the rand(seed) contrast: values survive repartitioning because
    // they are a pure function of the key
    val re = Pipeline.p20RandomFeatures(spark, sfDir).repartition(7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(re.toSeq == rows.sortBy(_._1).toSeq,
      "draws must be partition-invariant")
  }

  test("p23: normalized vectors have unit norm; bin/ewp are exact maps") {
    val rows = Pipeline.p23VectorTransforms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length % 64 == 0)
    rows.foreach { case (_, d, q, _, bin, ewp) =>
      assert(bin == (if (q > 0) 1L else 0L))
      assert(ewp == q * (d % 4 + 1))
    }
    // Normalizer contract: the unit vector's squared norm is 2^40
    // within per-component half-tick rounding (64 dims -> the cross
    // term bounds the drift well under 0.1%)
    rows.groupBy(_._1).foreach { case (v, g) =>
      val s = g.map(t => t._4.toDouble * t._4.toDouble).sum
      val unit = 1048576.0 * 1048576.0
      assert(math.abs(s - unit) / unit < 1e-3, s"vec $v norm^2 ratio ${s / unit}")
    }
    assert(rows.toSeq == Pipeline.p23VectorTransforms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq)
  }

  test("p25 scalers: hand-pinned z/min-max/max-abs on a planted " +
    "2-vector frame; corpus bounds and determinism") {
    val sess = spark
    import sess.implicits._
    // planted: v1 = [0, 0.5], v2 = [1.0, -0.5] -> ticks d0: {0, 1024},
    // d1: {512, -512}. Both dims have sample std ticks/sqrt(2) scaled,
    // so every z is exactly ±1/sqrt(2) -> floor(724.077 + 0.5) = 724
    val tmp = java.nio.file.Files.createTempDirectory("graft_p25").toString
    Seq((1L, Seq(0.0f, 0.5f)), (2L, Seq(1.0f, -0.5f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Pipeline.p25FeatureScalers(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got((1L, 0L)) == ((0L, -724L, 0L, 0L)))
    assert(got((2L, 0L)) == ((1024L, 724L, 1048576L, 1048576L)))
    assert(got((1L, 1L)) == ((512L, 724L, 1048576L, 1048576L)))
    assert(got((2L, 1L)) == ((-512L, -724L, 0L, -1048576L)))
    // corpus: min-max lands in [0, 2^20], max-abs in [-2^20, 2^20],
    // z means to ~0 per dimension; bit-identical across runs
    val rows = Pipeline.p25FeatureScalers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length % 64 == 0)
    rows.foreach { case (_, _, _, _, mm, ma) =>
      assert(mm >= 0L && mm <= 1048576L, s"mm $mm")
      assert(ma >= -1048576L && ma <= 1048576L, s"ma $ma")
    }
    rows.groupBy(_._2).foreach { case (d, g) =>
      val zbar = g.map(_._4).sum.toDouble / g.size
      assert(math.abs(zbar) < 2.0, s"dim $d z mean $zbar")
    }
    assert(rows.toSeq == Pipeline.p25FeatureScalers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq)
  }

  test("p26 feature expand: impulse and constant vectors pin the DCT " +
    "table exactly; poly terms are exact products; corpus deterministic") {
    val sess = spark
    import sess.implicits._
    // the quantized table keeps the half-sample symmetries EXACTLY:
    // w(4)(0) = floor(2^20/sqrt(2) + 0.5), and every k > 0 row sums
    // to 0 (antisymmetric or cancelling pairs) — so an impulse reads
    // the table column and a constant vector has zero AC energy
    assert(Pipeline.DctTicks(4)(0) == 741455L &&
      Pipeline.DctTicks(0)(0) == 1048576L)
    (1 until Pipeline.DctDims).foreach(k =>
      assert(Pipeline.DctTicks(k).sum == 0L, s"row $k sum"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_p26").toString
    Seq((1L, Seq(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
        (2L, Seq(1.0f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Pipeline.p26FeatureExpand(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    // impulse: dct_k = 1024 * w(k)(0); poly: p00 = 1024^2, rest 0
    val imp = got(1L)
    (0 until Pipeline.DctDims).foreach { k =>
      assert(imp.getLong(10 + k) == 1024L * Pipeline.DctTicks(k).head,
        s"impulse dct$k")
    }
    assert(imp.getLong(4) == 1024L * 1024L && imp.getLong(5) == 0L)
    // constant: dct0 = 1024 * 8 * 2^20, every other dct exactly 0
    val const = got(2L)
    assert(const.getLong(10) == 1024L * 8L * 1048576L)
    (1 until Pipeline.DctDims).foreach(k =>
      assert(const.getLong(10 + k) == 0L, s"constant dct$k"))
    // corpus: deterministic, poly symmetric terms consistent
    val a = Pipeline.p26FeatureExpand(spark, sfDir).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) * r.getLong(1)) // p00 = q0^2
      assert(r.getLong(5) == r.getLong(1) * r.getLong(2)) // p01 = q0*q1
    }
    assert(a.toSeq == Pipeline.p26FeatureExpand(spark, sfDir).collect().toSeq)
  }

  test("p29: planted sweep where the MIDDLE lambda wins exactly; corpus " +
    "sweep picks one best per group and is deterministic") {
    import org.apache.spark.sql.functions.col
    val sess = spark
    import sess.implicits._
    // Plant (hand-solved): train slope is 1.5x the held-out truth
    // and Sum f1^2 / n = 1/2, so the ridge slope x1 = 1.5*S2/(S2+lam*n)
    // crosses 1.0 EXACTLY at lam = 0.25 — the middle grid point:
    //   lam=1/16 -> x1 = 4/3  (overfit survives the light ridge)
    //   lam=1/4  -> x1 = 1    (held-out residual identically 0)
    //   lam=1    -> x1 = 1/2  (overshrunk)
    // train: 8 rows (f1=+1, y=+1.5), 8 (f1=-1, y=-1.5), 16 (f1=0, y=0)
    // held-out (fold 0): 4 rows (f1=+1, y=+1), 4 (f1=-1, y=-1)
    val train =
      (1 to 8).map(i => ("G", (i % 3 + 1).toLong, 1.5, 1.0, 1.0, 0.0, 0.0)) ++
      (1 to 8).map(i => ("G", (i % 3 + 1).toLong, -1.5, 1.0, -1.0, 0.0, 0.0)) ++
      (1 to 16).map(i => ("G", (i % 3 + 1).toLong, 0.0, 1.0, 0.0, 0.0, 0.0))
    val held =
      (1 to 4).map(_ => ("G", 0L, 1.0, 1.0, 1.0, 0.0, 0.0)) ++
      (1 to 4).map(_ => ("G", 0L, -1.0, 1.0, -1.0, 0.0, 0.0))
    val base = (train ++ held)
      .toDF("l_returnflag", "fold", "r", "f0", "f1", "f2", "f3")
    val got = Pipeline.paramSweepCore(base).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    // hand-computed metric rows: residuals are exact on the 2^-12
    // coefficient grid (x1 = 4/3 ticks to 5461 -> |res| = 1365/4096)
    // r2 = 2^20 - sse6*2^20/(syy6 centered: 32768/8 per n form);
    // evar = spp6*32 with sp6 = 0 (p6 = +/-85, +/-64, +/-32)
    assert(got.toSeq == Seq(
      (256L, "G", 8L, 349440L, 112896L, 935680L, 1849600L, false),
      (1024L, "G", 8L, 0L, 0L, 1048576L, 1048576L, true),
      (4096L, "G", 8L, 524288L, 262144L, 786432L, 262144L, false)),
      s"planted sweep mismatch:\n${got.toSeq}")
    // corpus: 3 lambdas x groups, exactly one best per group, the
    // best row carries that group's minimum held-out mse, two runs
    // bit-identical
    val a = Pipeline.p29ParamSweep(spark, sfDir).collect()
    val b = Pipeline.p29ParamSweep(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 3 * a.map(_.getString(1)).distinct.length)
    a.groupBy(_.getString(1)).foreach { case (g, rs) =>
      val best = rs.filter(_.getBoolean(7))
      assert(best.length == 1, s"group $g: ${best.length} best rows")
      assert(best.head.getLong(4) == rs.map(_.getLong(4)).min,
        s"group $g: best row is not the min-mse row")
    }
  }

  test("p22: held-out folds partition, models differ, fold-0 metrics replicate") {
    import graft.operators.Relational
    import org.apache.spark.sql.functions.col
    val rows = Pipeline.p22CrossValidation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == 4 * 3, s"4 folds x 3 groups, got ${rows.length}")
    // held-out rows partition the table
    val total = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_._3).sum == total)
    // fold sizes balanced within 4-sigma of n/4
    val perFold = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val sig = math.sqrt(total * 0.25 * 0.75)
    perFold.foreach { case (f, n) =>
      assert(math.abs(n - total / 4.0) < 4 * sig, s"fold $f size $n") }
    // the fold models are NOT the full-data model (this is held-out,
    // not resubstitution): at least one fold's coefficients differ
    val full = graft.operators.Recommend
      .solveSide(Relational.ridgeBase(spark, sfDir), "l_returnflag")
      .collect().map { r =>
        val n = r.schema.fieldNames.zipWithIndex.toMap
        r.getString(n("l_returnflag")) ->
          (0 to 3).map(k => r.getLong(n(s"t$k"))).toVector
      }.toMap
    val foldDiffers = (0 until Pipeline.CvFolds).exists { f =>
      graft.operators.Recommend.solveSide(
          Relational.ridgeBase(spark, sfDir).filter(col("fold") =!= f.toLong),
          "l_returnflag")
        .collect().exists { r =>
          val n = r.schema.fieldNames.zipWithIndex.toMap
          (0 to 3).map(k => r.getLong(n(s"t$k"))).toVector !=
            full(r.getString(n("l_returnflag")))
        }
    }
    assert(foldDiffers, "fold models must differ from the full-data model")
    // fold-0 truth: rescore the held-out rows in memory with the
    // fold-0 model (the p18 spec arithmetic, held-out edition)
    val base = Relational.ridgeBase(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Array(r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
    val m0 = graft.operators.Recommend.solveSide(
        Relational.ridgeBase(spark, sfDir).filter(col("fold") =!= 0L),
        "l_returnflag")
      .collect().map { r =>
        val n = r.schema.fieldNames.zipWithIndex.toMap
        r.getString(n("l_returnflag")) ->
          (0 to 3).map(k => r.getDouble(n(s"f$k"))).toArray
      }.toMap
    val truth = base.filter(_._2 == 0L).groupBy(_._1).map { case (g, rs) =>
      val c = m0(g)
      val q = rs.map { case (_, _, r, fv) =>
        val pred = c(0) * fv(0) + c(1) * fv(1) + c(2) * fv(2) + c(3) * fv(3)
        (math.floor((r - pred) * 4096.0 + 0.5).toLong,
          math.floor((r - pred) * 64.0 + 0.5).toLong,
          math.floor(r * 64.0 + 0.5).toLong)
      }
      val n = q.length.toLong
      g -> (n, (q.map(t => math.abs(t._1)).sum * 256) / n,
        (q.map(t => t._2 * t._2).sum * 256) / n)
    }
    rows.filter(_._1 == 0L).foreach { case (_, g, n, mae, mse, _, _) =>
      val (tn, tmae, tmse) = truth(g)
      assert(n == tn && mae == tmae && mse == tmse,
        s"fold-0 $g: ($n,$mae,$mse) != ($tn,$tmae,$tmse)")
    }
    assert(rows.toSeq == Pipeline.p22CrossValidation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq)
  }

  test("p21: planted quartiles split exactly; corpus buckets balance") {
    val sess = spark
    import sess.implicits._
    // values 1..8 once each: type-1 quartile splits are exactly
    // 2/4/6 and the four buckets hold exactly two docs each
    val docs = (1L to 8L).map(i => (i, i)).toDF("doc_id", "v")
    val out = Pipeline.quantileBinsCore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 1L, 2L), (1L, 4L, 2L, 3L, 4L),
      (2L, 6L, 2L, 5L, 6L), (3L, 8L, 2L, 7L, 8L)), out.toSeq)
    // corpus: buckets partition the table, are ordered and balanced
    // within the tie tolerance
    val c = Pipeline.p21QuantileBins(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = Tables.documents(spark, sfDir).count()
    assert(c.map(_._2).sum == total)
    c.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"buckets must be disjoint ordered: $a $b")
    }
    val ideal = total.toDouble / 4
    c.foreach { case (bk, n, _, _) =>
      assert(n > 0.5 * ideal && n < 1.5 * ideal, s"bucket $bk size $n") }
    assert(c.toSeq == Pipeline.p21QuantileBins(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
  }

  test("p19: ranking metrics match a brute-force in-memory rescore") {
    import graft.operators.Recommend
    val k = Recommend.RecTopK
    val out = Pipeline.p19RankingEval(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head
    // truth: replay the integer arithmetic over the collected serve
    // list and rated pairs
    val rec = Recommend.s25RecommendTopk(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val rel = Recommend.purchaseRatings(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val nrel = rel.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val perUser = rec.groupBy(_._1).toSeq.map { case (c, g) =>
      val hits = g.sortBy(_._2).map(t => if (rel((c, t._3))) 1L else 0L)
      val cum = hits.scanLeft(0L)(_ + _).tail
      val hitsK = hits.sum
      val apNum = hits.zip(cum).zipWithIndex.collect {
        case ((1L, ch), i) => (ch * 1048576L) / (i + 1L)
      }.sum
      val dcg = hits.zipWithIndex.collect {
        case (1L, i) => Pipeline.NdcgWTicks(i)
      }.sum
      val m = math.min(k.toLong, nrel(c))
      ((hitsK * 1048576L) / k, apNum / m, (hitsK * 1048576L) / nrel(c),
        (dcg * 1048576L) / Pipeline.NdcgIdcgTicks(m.toInt - 1))
    }
    val n = perUser.size.toLong
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == perUser.map(_._1).sum / n, "p@k")
    assert(r.getLong(2) == perUser.map(_._2).sum / n, "map@k")
    assert(r.getLong(3) == perUser.map(_._3).sum / n, "recall@k")
    assert(r.getLong(4) == perUser.map(_._4).sum / n, "ndcg@k")
    // all means live on the [0, 2^20] tick interval
    (1 to 4).foreach(i =>
      assert(r.getLong(i) >= 0L && r.getLong(i) <= 1048576L))
    assert(out.toSeq == Pipeline.p19RankingEval(spark, sfDir).collect().toSeq)
  }

  test("p18: planted exact fit pins the metric endpoints") {
    val sess = spark
    import sess.implicits._
    // r = 2*f1 + 3 exactly, on-grid; the true model scores residual 0
    val base = (1 to 8).map(i => ("g", 2.0 * i + 3.0, 1.0, i.toDouble, 0.0, 0.0))
      .toDF("l_returnflag", "r", "f0", "f1", "f2", "f3")
    val model = Seq(("g", 3.0, 2.0, 0.0, 0.0))
      .toDF("l_returnflag", "c0", "c1", "c2", "c3")
    val out = Pipeline.regressionMetrics(base, model).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 8L)
    assert(r.getLong(2) == 0L, "exact fit must give MAE 0")
    assert(r.getLong(3) == 0L, "exact fit must give MSE 0")
    assert(r.getLong(4) == 1048576L, "exact fit must give R2 = 2^20")
    // explained variance equals target variance when pred == target:
    // p6 = 64*(2i+3), i=1..8 -> sp6 = 64*96 = 6144, spp6 = 4096*1320
    assert(r.getLong(5) ==
      (((8L * 4096L * 1320L - 6144L * 6144L) / 8L) * 256L) / 8L)
  }

  test("p24 data scaling: identical folds give a flat curve; a noisy " +
    "first fold learns out; the full pool replicates p22's last fold") {
    val sess = spark
    import sess.implicits._
    def frame(rows: Seq[(String, Long, Double, Double, Double, Double, Double)]) =
      rows.toDF("l_returnflag", "fold", "r", "f0", "f1", "f2", "f3")
    // Plant A: every fold holds the SAME eight rows -> the three
    // nested pools are the same distribution at 1x/2x/3x size, so
    // all three models (and their held-out metrics) are IDENTICAL;
    // only n_train moves. The flat curve is the no-signal baseline.
    val rowsA = for (f <- 0L to 3L; i <- 1L to 8L)
      yield ("A", f, 2.0 * i, 1.0, i.toDouble, 0.0, 0.0)
    val a = Pipeline.dataScaling(frame(rowsA)).collect()
      .map(r => (r.getLong(0), r.getLong(2), (4 to 7).map(r.getLong).toSeq))
    assert(a.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(a.map(_._2).toSeq == Seq(8L, 16L, 24L), "nested pool sizes")
    assert(a.map(_._3).distinct.length == 1,
      s"identical pools must give identical metrics: ${a.toSeq}")
    // Plant B: fold 0 carries the WRONG slope (y = x), folds 1-2 and
    // the eval fold the true one (y = 3x) -> each extra fold dilutes
    // the bad slope, so held-out MSE strictly falls and R2 strictly
    // rises: the learning curve actually curves.
    val rowsB = for (f <- 0L to 3L; i <- 1L to 8L)
      yield ("B", f, (if (f == 0L) 1.0 else 3.0) * i, 1.0, i.toDouble, 0.0, 0.0)
    val b = Pipeline.dataScaling(frame(rowsB)).collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6)))
    val mse = b.map(_._2).toSeq
    val r2 = b.map(_._3).toSeq
    assert(mse(0) > mse(1) && mse(1) > mse(2), s"mse must fall: $mse")
    assert(r2(0) < r2(1) && r2(1) < r2(2), s"r2 must rise: $r2")
    // corpus: the t = 3 pool IS p22's fold-3 training complement and
    // the eval fold IS p22's fold-3 held-out set, so the last curve
    // point must replicate p22's fold-3 row metric-for-metric
    val p24 = Pipeline.p24DataScaling(spark, sfDir).collect()
      .filter(_.getLong(0) == 3L)
      .map(r => (r.getString(1), r.getLong(3), (4 to 7).map(r.getLong).toSeq))
      .toSeq.sortBy(_._1)
    val p22 = Pipeline.p22CrossValidation(spark, sfDir).collect()
      .filter(_.getLong(0) == 3L)
      .map(r => (r.getString(1), r.getLong(2), (3 to 6).map(r.getLong).toSeq))
      .toSeq.sortBy(_._1)
    assert(p24 == p22, s"p24 t=3 must equal p22 fold=3:\n$p24\nvs\n$p22")
    assert(Pipeline.p24DataScaling(spark, sfDir).collect().toSeq ==
      Pipeline.p24DataScaling(spark, sfDir).collect().toSeq)
  }

  test("p27 multilabel: hand-counted parity on a planted corpus; empty-set guards") {
    val sess = spark
    import sess.implicits._
    // planted sets: u1 actual {A,B} / predicted {A}; u2 actual {A} /
    // predicted {A,C}; u3 both empty (the exact-match and
    // division-guard case). Rows are generated to sit exactly at or
    // under the count/cents thresholds.
    def rowsFor(u: Long, t: String, act: Boolean, pred: Boolean) = {
      val n = if (act) Pipeline.MlActualMinCount.toInt else 1
      val per = if (pred) (Pipeline.MlPredictedMinCents + n - 1) / n else 1L
      Seq.fill(n)((u, t, per))
    }
    val raw = (rowsFor(1L, "A", act = true, pred = true) ++
      rowsFor(1L, "B", act = true, pred = false) ++
      rowsFor(2L, "A", act = true, pred = true) ++
      rowsFor(2L, "C", act = false, pred = true) ++
      rowsFor(3L, "A", act = false, pred = false))
      .toDF("user_id", "event_type", "cents")
    val got = Pipeline.multilabelReport(raw).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    val T = Pipeline.MlTickScale
    val expected = Map(
      ("precision", "A") -> (2L, 2L, Some(1.0)),
      ("precision", "B") -> (0L, 0L, None), // never predicted: NULL guard
      ("precision", "C") -> (0L, 1L, Some(0.0)),
      ("recall", "A") -> (2L, 2L, Some(1.0)),
      ("recall", "B") -> (0L, 1L, Some(0.0)),
      ("recall", "C") -> (0L, 0L, None), // never actual: NULL guard
      ("f1", "A") -> (4L, 4L, Some(1.0)),
      ("f1", "B") -> (0L, 1L, Some(0.0)),
      ("f1", "C") -> (0L, 1L, Some(0.0)),
      ("micro_precision", "_all") -> (2L, 3L, Some(0.6667)),
      ("micro_recall", "_all") -> (2L, 3L, Some(0.6667)),
      ("micro_f1", "_all") -> (4L, 6L, Some(0.6667)),
      ("subset_accuracy", "_all") -> (1L, 3L, Some(0.3333)),
      ("hamming_loss", "_all") -> (2L, 9L, Some(0.2222)),
      // doc-averaged ticks: u1 |i|/|u| = 1/2, u2 1/2, u3 vacuous 1
      ("accuracy", "_all") -> (2L * (T / 2) + T, 3L * T, Some(0.6667)),
      ("doc_precision", "_all") -> (T + T / 2 + T, 3L * T, Some(0.8333)),
      ("doc_recall", "_all") -> (T / 2 + T + T, 3L * T, Some(0.8333)),
      ("doc_f1", "_all") -> (2L * (2 * T / 3) + T, 3L * T, Some(0.7777)),
      ("macro_f1", "_all") -> (T, 3L * T, Some(0.3333)))
    assert(got.size == expected.size, s"row count: ${got.size} vs ${expected.size}")
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"$k: got ${got(k)}, expected $v")
    }
    // corpus determinism
    val a = Pipeline.p27Multilabel(spark, sfDir).collect().toSeq
    assert(a == Pipeline.p27Multilabel(spark, sfDir).collect().toSeq)
    assert(a.nonEmpty)
  }

  test("p28 sampled ranking eval: pct=100 equals exact p19 bit-for-bit; " +
    "the 25% sample scores fewer users, bounded metrics, deterministic") {
    import graft.operators.Pipeline
    // when the sample does not bind (every bucket < 100), the sampled
    // pipeline IS the exact pipeline — same serve tail, same metrics
    val full = Pipeline.rankingEvalSampledAt(spark, sfDir, 100L)
      .collect().toSeq.map(_.toSeq)
    val exact = Pipeline.p19RankingEval(spark, sfDir)
      .collect().toSeq.map(_.toSeq)
    assert(full == exact, s"pct=100 must equal exact p19: $full vs $exact")
    val sampled = Pipeline.p28RankingEvalSampled(spark, sfDir).collect()
    assert(sampled.length == 1)
    val r = sampled.head
    val nFull = exact.head.head.asInstanceOf[Long]
    assert(r.getLong(0) > 0 && r.getLong(0) < nFull,
      s"sample must be a strict non-empty subset: ${r.getLong(0)} of $nFull")
    (1 to 4).foreach(i => assert(r.getLong(i) >= 0L && r.getLong(i) <= 1048576L,
      s"metric $i out of ticks range"))
    assert(sampled.map(_.toSeq).toSeq ==
      Pipeline.p28RankingEvalSampled(spark, sfDir).collect().map(_.toSeq).toSeq)
  }
}
