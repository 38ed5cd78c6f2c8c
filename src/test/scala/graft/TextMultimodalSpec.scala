package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, TextAnalysis}
import graft.functions.Kernels

/** Value-level checks for the text-analysis and multimodal operators
  * whose oracle is rows-only.
  */
class TextMultimodalSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = TestSpark.spark

  private def u(s: String) = UTF8String.fromString(s)

  test("t01 langid: classifies obvious english/spanish, deterministic") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat and the dog sat on the mat with a hat", "en", "s", 45L),
      (1L, "el perro y el gato en la casa de los abuelos por la tarde", "es", "s", 57L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_langid").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.t01Langid(spark, tmp).collect()
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toMap == Map(0L -> "en", 1L -> "es"))
    // deterministic over the real corpus
    val a = TextAnalysis.t01Langid(spark, sfDir).collect().toSeq
    val b = TextAnalysis.t01Langid(spark, sfDir).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("t04 fingerprint: shared substrings share fingerprints; disjoint texts don't") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val fpA = Kernels.winnow(u(base + " alpha beta gamma"), 8, 4).toLongArray().toSet
    val fpB = Kernels.winnow(u("prefix words here " + base), 8, 4).toLongArray().toSet
    val fpC = Kernels.winnow(u("zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg"), 8, 4).toLongArray().toSet
    assert((fpA & fpB).nonEmpty, "overlapping texts must share winnowed fingerprints")
    assert((fpA & fpC).isEmpty, "disjoint texts should not collide")
    val out = TextAnalysis.t04Fingerprint(spark, sfDir)
    assert(out.columns.toSeq == Seq("doc_id", "n_fp", "fp_min", "fp_max", "shares_fp"))
    assert(out.count() == Tables.documents(spark, sfDir).count())
  }

  test("kernel: wordGrams and repetitionTop") {
    val g = Kernels.wordGrams(u("a  b\tc\nd"), 2)
    assert(g.toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq == Seq("a b", "b c", "c d"))
    assert(Kernels.wordGrams(u("one"), 2).numElements() == 0)
    val r = Kernels.repetitionTop(u("x y x y x z"), 2)
    // 2-grams: "x y","y x","x y","y x","x z" -> total 5, top "x y" (2)
    assert(r.getLong(0) == 5L)
    assert(r.getUTF8String(1).toString == "x y")
    assert(r.getLong(2) == 2L)
    assert(Kernels.repetitionTop(u("solo"), 2) == null)
    // tie-break: all counts 1 -> binary-smallest gram
    val t = Kernels.repetitionTop(u("b a c"), 2)
    assert(t.getUTF8String(1).toString == "a c" && t.getLong(2) == 1L)
  }


  test("t16 source KL: matched-distribution sources sit at 0, a skewed one above") {
    import spark.implicits._
    // srcA and srcB draw the SAME token distribution (so each equals
    // the 2-source blend -> KL 0 up to tick noise); srcC is skewed.
    val docs = Seq(
      (0L, "alpha beta gamma delta alpha beta", "en", "srcA", 1L),
      (1L, "alpha beta gamma delta alpha beta", "en", "srcB", 1L),
      (2L, "alpha alpha alpha alpha alpha alpha", "en", "srcC", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_t16").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.t16SourceKl(spark, tmp).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set("srcA", "srcB", "srcC"))
    assert(out("srcA")._1 == 6L && out("srcA")._2 == 4L)
    assert(out("srcC")._2 == 1L)
    // identical distributions are NOT at 0 here because srcC shifts
    // the blend; but A and B must agree exactly with each other
    assert(out("srcA")._3 == out("srcB")._3)
    // the skewed source diverges more than the matched pair
    assert(out("srcC")._3 > out("srcA")._3)
    // two-source-only corpus: each source IS the blend -> KL == 0
    val docs2 = Seq(
      (0L, "alpha beta gamma delta alpha beta", "en", "srcA", 1L),
      (1L, "alpha beta gamma delta alpha beta", "en", "srcB", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_t16b").toString
    docs2.write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    TextAnalysis.t16SourceKl(spark, tmp2).collect()
      .foreach(r => assert(r.getDouble(3) == 0.0, s"${r.getString(0)} should be at 0"))
    // Gibbs on the real corpus: KL >= 0 up to summed tick rounding
    val real = TextAnalysis.t16SourceKl(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getDouble(3) >= -0.001, s"${r.getString(0)} negative KL"))
  }

  test("t09 surprisal matches the brute-force unigram model") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[ \n\t\r]+").filter(_.nonEmpty).toSeq
    val all = docs.flatMap(d => toks(d._2))
    val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTotal = all.length.toLong
    val vSize = cnt.size.toLong
    def q(tok: String): Long =
      math.floor(-(math.log((cnt(tok) + 1.0) / (tTotal + vSize)) / math.log(2.0))
        * 1048576.0 + 0.5).toLong
    val byId = TextAnalysis.t09Surprisal(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(byId.size == docs.length)
    docs.foreach { case (id, text) =>
      val ts = toks(text)
      val (n, s) = byId(id)
      assert(n == ts.length, s"doc $id n_tokens")
      if (ts.nonEmpty) {
        val want = ts.map(q).sum.toDouble / (1048576.0 * ts.length)
        // one quantization tick + rounding tolerance
        assert(math.abs(s - want) < 2e-4, s"doc $id: $s vs $want")
      }
    }
    // sanity: scores spread across documents (not one degenerate value)
    val scores = byId.values.collect { case (n, s) if n > 0 => s }.toSeq
    assert(scores.distinct.size > 1, "surprisal should spread")
  }


  test("t15 bigram bits matches the brute-force conditional model") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[ \n\t\r]+").filter(_.nonEmpty).toSeq
    val all = docs.map(d => toks(d._2))
    val uni = all.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vSize = uni.size.toLong
    val bigrams = all.flatMap(ts => ts.sliding(2).filter(_.size == 2)
      .map(p => (p.head, p(1))).toSeq)
    val cb = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def q(p: (String, String)): Long =
      math.floor(-(math.log((cb(p) + 1.0) / (uni(p._1) + vSize)) / math.log(2.0))
        * 1048576.0 + 0.5).toLong
    val byId = TextAnalysis.t15BigramBits(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(byId.size == docs.length)
    docs.foreach { case (id, text) =>
      val ps = toks(text).sliding(2).filter(_.size == 2)
        .map(p => (p.head, p(1))).toSeq
      val (n, s) = byId(id)
      assert(n == ps.length, s"doc $id n_bigrams")
      if (ps.nonEmpty) {
        val want = ps.map(q).sum.toDouble / (1048576.0 * ps.length)
        assert(math.abs(s - want) < 2e-4, s"doc $id: $s vs $want")
      } else assert(s.isNaN, s"doc $id must have null bits with no bigrams")
    }
    // conditional bits differ from t09's unigram bits (a genuinely
    // different signal, not a re-labeling): the two scores disagree
    // on at least some documents
    val t09 = TextAnalysis.t09Surprisal(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val diff = byId.collect {
      case (id, (n, s)) if n > 0 && !t09(id).isNaN => math.abs(s - t09(id))
    }
    assert(diff.exists(_ > 0.1), "bigram bits should not mirror unigram bits")
  }

  test("t17 RAKE matches a brute-force plain-Scala reimplementation") {
    val stop = TextAnalysis.RakeStopwords.toSet
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // phrases: maximal stopword-free runs of the filtered lowercase
    // token stream, per doc
    val phrases = docs.flatMap { case (_, text) =>
      val toks = text.toLowerCase.split("[ \n\t\r]+").filter(_.nonEmpty)
      val runs = scala.collection.mutable.Buffer[List[String]]()
      var cur = List.empty[String]
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = t :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val deg = phrases.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wScore = freq.keys.map(w => w -> (deg(w) * 1048576L) / freq(w)).toMap
    val expected = phrases.filter(_.length <= 4)
      .map(p => (p.mkString(" "), p.map(wScore).sum))
      .groupBy(_._1).map { case (ph, occ) => (ph, occ.size.toLong, occ.head._2) }
      .toSeq.sortBy { case (ph, _, s) => (-s, ph) }.take(30)
    val got = TextAnalysis.t17RakeKeyphrases(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("m01 binary meta: mime follows the magic bytes, hash is content-derived") {
    val out = Multimodal.m01BinaryMeta(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val expected = (r.getLong(0) % 3) match {
        case 0 => "image/png"
        case 1 => "image/jpeg"
        case 2 => "audio/wav"
      }
      assert(r.getString(1) == expected, s"doc ${r.getLong(0)}")
      assert(r.getLong(2) > 4, "byte_len must include payload beyond magic")
    }
    // distinct docs → distinct content hashes (payloads differ)
    assert(out.map(_.getString(3)).distinct.length == out.length)
  }

  test("m05 integrity: statuses match the deterministic corruption pattern") {
    val out = Multimodal.m05Integrity(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      // mime mismatch only when the png mislabel hits a non-png doc;
      // length mismatch exactly on the over-declared uploads
      val mimeBad = id % 7 == 3 && id % 3 != 0
      val lenBad = id % 11 == 5
      val expected =
        if (mimeBad && lenBad) "mime+len"
        else if (mimeBad) "mime_mismatch"
        else if (lenBad) "len_mismatch"
        else "ok"
      assert(r.getString(5) == expected, s"doc $id")
      assert(r.getLong(4) > 4, "actual_len must include payload beyond magic")
    }
    // every verdict class occurs in the corpus (the gate is exercised)
    val classes = out.map(_.getString(5)).toSet
    assert(classes == Set("ok", "mime_mismatch", "len_mismatch", "mime+len"),
      s"missing verdict classes: $classes")
  }

  test("m03 frame sample: real animated-GIF roundtrip pins exact dims and " +
    "per-frame pixel sums; corpus run stride-samples, deterministic") {
    // hand-planted kernel pins: encode -> real animated-GIF container
    // bytes -> real ImageIO decode must reproduce the arithmetic
    // frame plant exactly (indexed 256-gray GIF is lossless)
    for (id <- Seq(2L, 5L, 8L, 11L, 14L)) {
      val blob = Multimodal.encodeGif(id)
      assert(blob.take(3).map(_.toChar).mkString == "GIF", s"id $id magic")
      val (mime, nf, w, h, frames) = Multimodal.decodeGifFrames(blob)
      assert(mime == "image/gif", s"id $id sniffed $mime")
      assert(nf == Multimodal.gifFrames(id), s"id $id frames $nf")
      assert(w == Multimodal.gifWidth(id) && h == Multimodal.gifHeight(id),
        s"id $id dims ${w}x$h")
      val wantIdx = 0 until nf by Multimodal.GifFrameStride
      assert(frames.map(_._1) == wantIdx.toSeq, s"id $id sampled frames")
      frames.foreach { case (f, sum) =>
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.gifPix(id, f, x, y).toLong).sum
        assert(sum == want, s"id $id frame $f pixel sum $sum vs $want")
      }
    }
    val out = Multimodal.m03FrameSample(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(id % 3 == 2, "only multi-frame modality rows are sampled")
      assert(r.getString(1) == "image/gif")
      assert(r.getLong(3) == Multimodal.gifFrames(id))
      assert(r.getLong(4) == Multimodal.gifWidth(id))
      assert(r.getLong(5) == Multimodal.gifHeight(id))
    }
    // sampled frame indexes are exactly the stride grid per doc
    out.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val want = 0 until Multimodal.gifFrames(id) by Multimodal.GifFrameStride
      assert(rs.map(_.getInt(2)).sorted.toSeq == want.toSeq, s"doc $id")
    }
    val again = Multimodal.m03FrameSample(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("m06 media near-dup: equals brute-force frame-set Jaccard, cap does not bind") {
    // brute-force truth from the fingerprint windows themselves
    val frames = Multimodal.byteWindowFingerprints(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val sets = frames.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = sets.keys.toSeq.sorted
    val expect = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      a = docs(i); b = docs(j)
      sh = (sets(a) & sets(b)).size.toLong
      un = (sets(a) | sets(b)).size.toLong
      if Multimodal.NearDupDen * sh >= Multimodal.NearDupNum * un
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, sh,
      BigDecimal(sh.toDouble / un).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSeq
    val got = Multimodal.m06MediaNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // the fan-out cap must not bind at test SFs — the oracle has no cap
    val maxDocsPerDigest = frames.distinct.groupBy(_._2).values.map(_.length).max
    assert(maxDocsPerDigest <= Multimodal.MediaBucketCap,
      s"digest fan-out $maxDocsPerDigest would bind the cap")
  }

  test("m02 image decode: exact dims/means on planted PNG/BMP, batched, deterministic") {
    // hand-planted kernel pins: encode -> real container bytes ->
    // real ImageIO decode must reproduce the arithmetic pixel plant
    // exactly (PNG and BMP are lossless)
    for (id <- Seq(0L, 3L, 4L, 7L)) {
      val blob = Multimodal.encodeImage(id)
      val (mime, w, h, bands, sr, sg, sb) = Multimodal.decodeImageStats(blob)
      val expMime = if (id % 3 == 0) "image/png" else "image/bmp"
      assert(mime == expMime, s"id $id sniffed $mime")
      assert(w == Multimodal.imgWidth(id) && h == Multimodal.imgHeight(id),
        s"id $id dims ${w}x$h")
      val expBands = if (id % 3 == 0 && id % 2 == 0) 4 else 3
      assert(bands == expBands, s"id $id bands $bands")
      val px = for (y <- 0 until h; x <- 0 until w) yield
        (Multimodal.imgR(id, x, y).toLong, Multimodal.imgG(id, x, y).toLong,
          Multimodal.imgB(id, x, y).toLong)
      assert((sr, sg, sb) == (px.map(_._1).sum, px.map(_._2).sum, px.map(_._3).sum),
        s"id $id channel sums drifted: ($sr, $sg, $sb)")
    }
    val out = Multimodal.m02ImageFeatures(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bn = r.getInt(8)
      assert(bn >= 1 && bn <= 32, s"batch_n $bn out of bounds")
      assert(r.getLong(4) == 3L || r.getLong(4) == 4L)
      (5 to 7).foreach { j =>
        val t = r.getLong(j)
        assert(t >= 0L && t < 256L * 4096L, s"mean ticks $t out of range")
      }
    }
    // corpus determinism: a second decode pass is bit-identical
    val again = Multimodal.m02ImageFeatures(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // driver-facing output drops only the physical batch column
    val driverCols = Multimodal.m02ImageDecode(spark, sfDir).columns.toSeq
    assert(driverCols == Seq("doc_id", "mime", "width", "height",
      "n_channels", "mean_r_ticks", "mean_g_ticks", "mean_b_ticks"))
  }

  test("m07 audio decode: exact header/sums on planted WAV, mono and stereo") {
    // planted kernel pins: encode -> real WAV container -> real
    // javax.sound decode must reproduce the arithmetic PCM plant
    // exactly (WAV PCM is lossless). ids cover mono/stereo and all
    // three sample rates.
    for (id <- Seq(2L, 5L, 8L, 11L)) {
      val blob = Multimodal.encodeWav(id)
      val (mime, rate, ch, n, s0, s1) = Multimodal.decodeWavStats(blob)
      assert(mime == "audio/wav", s"id $id sniffed $mime")
      assert(rate == Multimodal.wavRate(id).toLong, s"id $id rate $rate")
      assert(ch == Multimodal.wavChannels(id).toLong, s"id $id channels $ch")
      assert(n == Multimodal.wavFrames(id).toLong, s"id $id frames $n")
      val want0 = (0 until Multimodal.wavFrames(id))
        .map(i => Multimodal.wavSample(id, 0, i).toLong).sum
      val want1 = if (ch == 2)
        (0 until Multimodal.wavFrames(id))
          .map(i => Multimodal.wavSample(id, 1, i).toLong).sum
      else 0L
      assert((s0, s1) == (want0, want1), s"id $id sums ($s0, $s1)")
    }
    val out = Multimodal.m07AudioFeatures(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bn = r.getInt(7)
      assert(bn >= 1 && bn <= 32, s"batch_n $bn out of bounds")
      assert(Seq(8000L, 11025L, 16000L).contains(r.getLong(2)))
      assert(r.getLong(3) == 1L || r.getLong(3) == 2L)
      if (r.getLong(3) == 1L) assert(r.getLong(6) == 0L, "mono sum_ch1 must be 0")
    }
    // corpus determinism
    val again = Multimodal.m07AudioFeatures(spark, sfDir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val driverCols = Multimodal.m07AudioDecode(spark, sfDir).columns.toSeq
    assert(driverCols == Seq("doc_id", "mime", "sample_rate", "channels",
      "n_frames", "sum_ch0", "sum_ch1"))
  }

  test("t18 bpe: known merge sequence, tie-break, and exhaustion contract") {
    import spark.implicits._
    // "low"×2 + "lower"×1: round 1 ties (l,o)=3 with (o,w)=3 -> lexicographic
    // smallest left wins; the vocabulary fully merges after 4 rounds and
    // both engines emit only the realized rounds (exhaustion contract).
    val vocab = Seq(("low", 2L), ("lower", 1L)).toDF("w", "freq")
    val out = TextAnalysis.bpeMerges(vocab).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, "l", "o", "lo", 3L, 8L),
      (2L, "lo", "w", "low", 3L, 5L),
      (3L, "e", "r", "er", 1L, 4L),
      (4L, "low", "er", "lower", 1L, 3L)))
  }

  test("t18 bpe: greedy run contract — all non-overlapping merges per round") {
    import spark.implicits._
    // "aaaa": pair (a,a) counts 3; the doubled-boundary replace merges
    // ALL non-overlapping occurrences left to right in ONE round
    // (" aa aa ", 2 symbols) — the reference trainers' greedy
    // application — and the round budget exhausts after the full word
    // assembles (no phantom rounds: exhaustion contract).
    val out = TextAnalysis.bpeMerges(Seq(("aaaa", 1L)).toDF("w", "freq"))
      .collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, "aa", 3L, 2L),     // " aa aa " — all non-overlapping, one round
      (2L, "aaaa", 1L, 1L)))  // then (aa,aa) completes; rounds 3+ empty
    // odd run: the trailing singleton survives round 1 ("aa aa a"),
    // and the (aa,a) / (aa,aa) tie breaks to the lexicographically
    // smaller right symbol
    val odd = TextAnalysis.bpeMerges(Seq(("aaaaa", 1L)).toDF("w", "freq"))
      .collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4), r.getLong(5))).toSeq
    assert(odd == Seq(
      (1L, "aa", 4L, 3L),     // " aa aa a "
      (2L, "aaa", 1L, 2L),    // (aa,a) beats (aa,aa): "a" < "aa"
      (3L, "aaaaa", 1L, 1L)))
  }

  test("t19 naive bayes: perfect recovery on a separable corpus, deterministic") {
    import spark.implicits._
    // class-specific vocabularies — NB must recover every label
    val docs = Seq(
      (0L, "alpha beta alpha gamma", "aa", "s", 22L),
      (1L, "beta alpha alpha beta", "aa", "s", 21L),
      (2L, "delta epsilon delta zeta", "bb", "s", 24L),
      (3L, "epsilon zeta delta delta", "bb", "s", 24L),
      (4L, "eta theta eta iota", "cc", "s", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_nb").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.t19NaiveBayes(spark, tmp).collect()
    assert(out.forall(_.getBoolean(4)), s"separable corpus must classify perfectly: ${out.toSeq}")
    assert(out.map(_.getString(2)).toSeq == Seq("aa", "aa", "bb", "bb", "cc"))
    // corpus run: deterministic, every doc present, nll positive
    val a = TextAnalysis.t19NaiveBayes(spark, sfDir).collect()
    val b = TextAnalysis.t19NaiveBayes(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == Tables.documents(spark, sfDir).count())
    a.foreach(r => assert(r.getLong(3) > 0L))
  }

  test("t20 stump finds a perfectly separating feature with pure leaves") {
    import spark.implicits._
    // n_chars separates en from de exactly; text is identical so the
    // token features offer no split — the Gini search must pick
    // n_chars at the first populated bin with zero impurity
    val docs = (0L to 3L).map(i => (i, "x y z", "en", "s", 5L)) ++
      (4L to 7L).map(i => (i, "x y z", "de", "s", 500L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_stump").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = TextAnalysis.t20DecisionStump(spark, tmp).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "n_chars", s"wrong feature: $row")
    assert(row.getLong(4) == 0L, "separable data must reach zero Gini cost")
    assert(row.getLong(5) == 4L && row.getLong(6) == 4L && row.getBoolean(7),
      "left leaf must be the pure en side")
    assert(row.getLong(8) == 4L && row.getLong(9) == 0L && !row.getBoolean(10),
      "right leaf must be the pure de side")
    // corpus: deterministic, leaf counts partition the corpus
    val a = TextAnalysis.t20DecisionStump(spark, sfDir).collect()(0)
    val b = TextAnalysis.t20DecisionStump(spark, sfDir).collect()(0)
    assert(a == b)
    assert(a.getLong(5) + a.getLong(8) ==
      Tables.documents(spark, sfDir).count())
  }

  test("t34 regression forest: planted two-mean split recovered with " +
    "exact sub-tick leaf means; masked trees fall back to the next " +
    "separating feature; corpus deterministic") {
    import spark.implicits._
    // yr = token count: group A "x" (1 token, 5 chars), group B
    // "a b c d" (4 tokens, 500 chars). n_chars AND n_distinct both
    // separate perfectly (equal gain) -> the (gain desc, feature,
    // bin) order picks 'n_chars'; trees masking v1 (t % 3 == 0) must
    // pick 'n_distinct' instead. distinct_ratio is constant (all
    // tokens distinct) so it never has two populated bins.
    val docs = (0L to 7L).map(i => (i, "x", "en", "s", 5L)) ++
      (8L to 15L).map(i => (i, "a b c d", "en", "s", 500L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_rfr").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def kept(t: Int, doc: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rfr:$t:$doc".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(0, 4), 16) % 4 < 3
    }
    val rows = TextAnalysis.t34RfRegression(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (t <- 0 until TextAnalysis.RfTrees) {
      val sample = docs.map(_._1).filter(kept(t, _))
      val nA = sample.count(_ <= 7L); val nB = sample.size - nA
      if (nA == 0 || nB == 0) {
        assert(!rows.contains(t.toLong), s"tree $t split a one-group sample")
      } else {
        val r = rows(t.toLong)
        val wantFeature = if (t % 3 == 0) "n_distinct" else "n_chars"
        assert(r.getString(1) == wantFeature && r.getLong(2) == 0L,
          s"tree $t: got (${r.getString(1)}, bin ${r.getLong(2)}), " +
            s"want ($wantFeature, 0)")
        // perfect split: gain = nA + 16*nB exactly, means 1024 / 4096
        assert(r.getLong(5) == nA + 16L * nB, s"tree $t gain: $r")
        assert(r.getLong(6) == nA && r.getLong(7) == 1024L &&
          r.getLong(8) == nB && r.getLong(9) == 4096L,
          s"tree $t leaves: $r")
      }
    }
    // corpus: one row per tree, masked feature never chosen, stable
    val a = TextAnalysis.t34RfRegression(spark, sfDir).collect()
    assert(a.length == TextAnalysis.RfTrees)
    a.foreach { r =>
      val masked = Seq("n_chars", "distinct_ratio", "n_distinct")(
        (r.getLong(0) % 3).toInt)
      assert(r.getString(1) != masked,
        s"tree ${r.getLong(0)} chose its masked feature")
      assert(r.getLong(5) >= 0L)
    }
    assert(a.toSeq == TextAnalysis.t34RfRegression(spark, sfDir).collect().toSeq)
  }

  test("t25 forest: deterministic bootstrap, feature dropout, correct majority vote") {
    import spark.implicits._
    // n_chars separates en/de exactly; text identical so the token
    // features are constant — a tree that drops n_chars (t % 3 == 0)
    // has only constant features and must emit NO row (leaf case),
    // every other tree must find the n_chars split at zero cost on
    // its own md5 bootstrap.
    val docs = (0L to 7L).map(i => (i, "x y z", "en", "s", 5L)) ++
      (8L to 15L).map(i => (i, "x y z", "de", "s", 500L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_forest").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // replicate the md5 draw to know each tree's exact subsample
    def kept(t: Int, doc: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rf:$t:$doc".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(0, 4), 16) % 4 < 3
    }
    val rows = TextAnalysis.t25RandomForest(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (t <- 0 until TextAnalysis.RfTrees) {
      val sample = docs.map(_._1).filter(kept(t, _))
      val nEn = sample.count(_ <= 7L); val nDe = sample.size - nEn
      if (t % 3 == 0 || nEn == 0 || nDe == 0) {
        // dropped n_chars, or a single-class bootstrap: nothing to split
        assert(!rows.contains(t.toLong) ||
          (t % 3 != 0 && rows(t.toLong).getLong(5) == 0L))
      } else {
        val r = rows(t.toLong)
        assert(r.getString(1) == "n_chars" && r.getLong(5) == 0L,
          s"tree $t must split n_chars at zero cost: $r")
        // majority-vote check: this stump classifies every CORPUS doc
        // correctly (en below the split bin, de above)
        val (mn, mx, bin) = (r.getLong(3), r.getLong(4), r.getLong(2))
        def side(v: Long) = (v - mn) * TextAnalysis.StumpBins / (mx - mn + 1) <= bin
        assert(docs.forall { case (_, _, lang, _, nc) =>
          side(nc) == (lang == "en") })
      }
    }
    // the voting trees are unanimous and correct => majority vote is 1.0
    assert(rows.nonEmpty, "at least one tree must vote")
    // corpus: all trees split, never on their dropped feature
    val fr = TextAnalysis.t25RandomForest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(fr.map(_._1).toSeq == (0L until TextAnalysis.RfTrees.toLong).toSeq)
    val fname = Seq("n_chars", "n_tokens", "distinct_ratio")
    assert(fr.forall { case (t, f) => f != fname((t % 3).toInt) },
      s"a tree split on its dropped feature: ${fr.toSeq}")
  }

  test("t27 chi2: zero on an exactly independent table, N·phi2 on perfect association") {
    import spark.implicits._
    def corpus(rows: Seq[(String, String, Int)]): String = {
      val docs = rows.zipWithIndex.flatMap { case ((l, s, n), g) =>
        (0 until n).map(k => (g * 100L + k, "x", l, s, 1L))
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft_chi2").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      tmp
    }
    // exactly independent: counts proportional (9·10/15 = 6, …) —
    // every cell's chi2 is EXACTLY zero and expected == observed
    val ind = corpus(Seq(("en", "a", 6), ("en", "b", 3),
      ("de", "a", 4), ("de", "b", 2)))
    val ri = TextAnalysis.t27Chi2(spark, ind).collect()
    assert(ri.length == 4)
    assert(ri.forall(_.getLong(4) == 0L), s"independent table: ${ri.toSeq}")
    assert(ri.forall(r => r.getLong(3) == r.getLong(2) * 1048576L))
    // perfect association (diagonal): chi2 = N (phi² = 1) — each of
    // the 4 cells contributes exactly 2.5 → 10·2²⁰ total
    val dep = corpus(Seq(("en", "a", 5), ("de", "b", 5)))
    val rd = TextAnalysis.t27Chi2(spark, dep).collect()
    assert(rd.length == 4, "zero cells must be present")
    assert(rd.map(_.getLong(4)).sum == 10L * 1048576L, s"${rd.toSeq}")
    // corpus: full grid, statistic non-negative, deterministic
    val a = TextAnalysis.t27Chi2(spark, sfDir).collect()
    val nl = a.map(_.getString(0)).distinct.length
    val ns = a.map(_.getString(1)).distinct.length
    assert(a.length == nl * ns && a.forall(_.getLong(4) >= 0L))
    assert(a.toSeq == TextAnalysis.t27Chi2(spark, sfDir).collect().toSeq)
  }

  test("t26 boosting separates a band no single stump can") {
    import spark.implicits._
    // three n_chars bands: de(10) | en(100) | de(1000). Any single
    // threshold mislabels one full band (>= 8 docs); the 3-round
    // weighted vote must classify every doc correctly — boosting is
    // load-bearing, not decorative.
    val docs = (0L to 7L).map(i => (i, "x y z", "de", "s", 10L)) ++
      (8L to 15L).map(i => (i, "x y z", "en", "s", 100L)) ++
      (16L to 23L).map(i => (i, "x y z", "de", "s", 1000L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_boost").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.t26BoostedStumps(spark, tmp).collect()
    assert(rows.length == TextAnalysis.BoostRounds)
    assert(rows.forall(_.getString(1) == "n_chars"),
      "only n_chars varies — every round must split it")
    // per-stump and ensemble predictions from the MODEL rows alone
    def stumpPred(r: org.apache.spark.sql.Row, nc: Long): Boolean = {
      val (bin, mn, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      if ((nc - mn) * TextAnalysis.StumpBins / (mx - mn + 1) <= bin)
        r.getBoolean(8) else r.getBoolean(11)
    }
    for (r <- rows) {
      val wrong = docs.count { case (_, _, lang, _, nc) =>
        stumpPred(r, nc) != (lang == "en") }
      assert(wrong >= 8, s"round ${r.getLong(0)}: a single stump must " +
        s"mislabel a full band, got $wrong wrong")
    }
    val correct = docs.count { case (_, _, lang, _, nc) =>
      val vote = rows.map(r =>
        if (stumpPred(r, nc)) r.getLong(14) else -r.getLong(14)).sum
      (vote > 0L) == (lang == "en")
    }
    assert(correct == docs.size,
      s"weighted vote must separate all bands: $correct/${docs.size}")
    // alphas positive (every stump beats weighted chance) and err < half
    assert(rows.forall(r => r.getLong(14) > 0L &&
      2 * r.getLong(12) < r.getLong(13)))
    // corpus: 3 rounds, deterministic
    val a = TextAnalysis.t26BoostedStumps(spark, sfDir).collect().toSeq
    assert(a.size == TextAnalysis.BoostRounds &&
      a == TextAnalysis.t26BoostedStumps(spark, sfDir).collect().toSeq)
  }

  test("t22 tree recovers a planted two-level XOR structure") {
    import spark.implicits._
    // XOR plant: label = (short n_chars) XOR (many tokens) — NO single
    // split separates (every stump costs 2·8·gini(0.5)), so the root
    // falls to the (cost, feature, bin) tie-break ('n_chars' <
    // 'n_tokens'), and each CHILD then splits PURELY on n_tokens with
    // opposite leaf polarities. distinct_ratio is 1.0 for every doc
    // (all-unique tokens) — a single populated bin, provably inert.
    val few = "a b"
    val many = "a b c d e f g h"
    val docs =
      (0L to 3L).map(i => (i, few, "en", "s", 10L)) ++
      (4L to 7L).map(i => (i, many, "de", "s", 10L)) ++
      (8L to 11L).map(i => (i, few, "de", "s", 1000L)) ++
      (12L to 15L).map(i => (i, many, "en", "s", 1000L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tree").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.t22DecisionTree(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("root", "left", "right"))
    val root = rows("root")
    assert(root.getString(1) == "n_chars" && root.getLong(2) == 0L)
    // both root sides are 8 docs at gini 0.5: cost = 2·8·524288 ticks
    assert(root.getLong(5) == 8388608L, s"root cost: $root")
    for ((node, posLeft, predLeft) <- Seq(("left", 4L, true), ("right", 0L, false))) {
      val r = rows(node)
      assert(r.getString(1) == "n_tokens", s"$node must split on tokens: $r")
      assert(r.getLong(5) == 0L, s"$node leaves must be pure: $r")
      assert(r.getLong(6) == 4L && r.getLong(7) == posLeft &&
        r.getBoolean(8) == predLeft, s"$node left leaf: $r")
      assert(r.getLong(9) == 4L && r.getLong(10) == 4L - posLeft &&
        r.getBoolean(11) == !predLeft, s"$node right leaf: $r")
    }
    // corpus: the root row IS t20's stump, children partition its sides
    val tree = TextAnalysis.t22DecisionTree(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val stump = TextAnalysis.t20DecisionStump(spark, sfDir).collect()(0)
    assert(tree("root").toSeq.drop(1) == stump.toSeq)
    assert(tree("left").getLong(6) + tree("left").getLong(9) == stump.getLong(5),
      "left child rows must equal the root's n_left")
    assert(tree("right").getLong(6) + tree("right").getLong(9) == stump.getLong(8),
      "right child rows must equal the root's n_right")
  }

  test("t33 deep tree recovers a planted THREE-level parity structure " +
    "that no stump or depth-2 tree can separate") {
    import spark.implicits._
    // 3-bit parity plant: y = b1 XOR b2 XOR b3 over v1 = 100·b1,
    // v2 = 100·b2, v3 = 100·b3 (2 rows per cell, 16 rows). Every
    // 1-feature split of a balanced parity leaves 50/50 on both
    // sides, so EVERY level up to the last is decided purely by the
    // (cost, feature, bin) tie rule — hand-predictable:
    //   level 1: all three features tie at 16·gini(.5) ->
    //            'distinct_ratio' (lexicographically least), bin 0
    //   level 2: v3 constant per node (inert), v1/v2 tie ->
    //            'n_chars' both nodes
    //   level 3: v1, v3 constant -> ONLY 'n_tokens' has a candidate,
    //            and it splits PURE (cost 0) with parity-polarized
    //            leaves. Depth 3 fully separates what depth ≤ 2
    //            provably cannot.
    val cells = for (b1 <- 0 to 1; b2 <- 0 to 1; b3 <- 0 to 1; _ <- 1 to 2)
      yield (((b1 ^ b2 ^ b3).toLong, 100L * b1, 100L * b2, 100L * b3))
    val f = cells.toDF("y", "v1", "v2", "v3")
    val got = TextAnalysis.deepTreeFrom(f, 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == (1L to 7L).toSet, s"nodes: ${got.keySet}")
    // level 1: tie-broken to distinct_ratio, cost = 16·gini(.5) ticks
    assert(got(1L).getString(1) == "distinct_ratio" &&
      got(1L).getLong(2) == 0L && got(1L).getLong(5) == 16L * 524288L)
    // level 2: v3 inert in both children, n_chars wins the tie
    for (n <- Seq(2L, 3L)) {
      assert(got(n).getString(1) == "n_chars", s"node $n: ${got(n)}")
      assert(got(n).getLong(5) == 8L * 524288L, s"node $n cost: ${got(n)}")
    }
    // level 3: only n_tokens splittable, pure leaves, parity polarity
    for ((n, predLeft) <- Seq(4L -> false, 5L -> true, 6L -> true, 7L -> false)) {
      val r = got(n)
      assert(r.getString(1) == "n_tokens" && r.getLong(5) == 0L,
        s"node $n must split pure on n_tokens: $r")
      assert(r.getLong(6) == 2L && r.getLong(9) == 2L, s"node $n sizes: $r")
      assert(r.getBoolean(8) == predLeft && r.getBoolean(11) == !predLeft,
        s"node $n polarity: $r")
      assert(r.getLong(7) == (if (predLeft) 2L else 0L) &&
        r.getLong(10) == (if (predLeft) 0L else 2L), s"node $n purity: $r")
    }
    // corpus: the level-1 row IS t20's stump; deterministic
    val corpus = TextAnalysis.t33DeepTree(spark, sfDir).collect()
    val stump = TextAnalysis.t20DecisionStump(spark, sfDir).collect()(0)
    assert(corpus.head.getLong(0) == 1L &&
      corpus.head.toSeq.drop(1) == stump.toSeq)
    assert(corpus.toSeq == TextAnalysis.t33DeepTree(spark, sfDir).collect().toSeq)
    // child row counts reconcile with each parent's side counts
    val byNode = corpus.map(r => r.getLong(0) -> r).toMap
    for ((n, r) <- byNode if byNode.contains(2 * n)) {
      val kid = byNode(2 * n)
      assert(kid.getLong(6) + kid.getLong(9) == r.getLong(6),
        s"node ${2 * n} rows must equal node $n's n_left")
    }
    for ((n, r) <- byNode if byNode.contains(2 * n + 1)) {
      val kid = byNode(2 * n + 1)
      assert(kid.getLong(6) + kid.getLong(9) == r.getLong(9),
        s"node ${2 * n + 1} rows must equal node $n's n_right")
    }
  }

  test("t21 bpe encode: trained segmentation applied back, totals reconcile with t18") {
    import spark.implicits._
    // fully merged vocabulary encodes each word as ONE symbol
    val (_, vocab) = TextAnalysis.bpeTrain(
      Seq(("low", 2L), ("lower", 1L)).toDF("w", "freq"))
    val syms = vocab.collect()
      .map(r => r.getString(0) -> r.getString(2).trim.split(" ").length).toMap
    assert(syms == Map("low" -> 1, "lower" -> 1))
    // corpus: per-source report with the structural bounds, and the
    // cross-operator identity — t18's final symbols_after IS t21's
    // corpus-wide symbol total
    val rep = TextAnalysis.t21BpeEncode(spark, sfDir).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (w, s, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s >= w, "a word is at least one symbol")
      assert(s <= c, "a symbol spans at least one character")
      assert(r.getLong(4) == s * 1048576L / c)
    }
    val t18Final = TextAnalysis.t18BpeMerges(spark, sfDir).collect()
      .maxBy(_.getLong(0)).getLong(5)
    assert(rep.map(_.getLong(2)).sum == t18Final,
      "encoder totals must reconcile with the trainer's last round")
  }

  test("t18 bpe: corpus run — full rounds, shrinking corpus, deterministic") {
    val a = TextAnalysis.t18BpeMerges(spark, sfDir).collect()
    assert(a.length == TextAnalysis.BpeRounds)
    val after = a.map(_.getLong(5)).toSeq
    assert(after == after.sorted.reverse && after.distinct == after,
      s"symbols_after must strictly decrease: $after")
    a.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
    val b = TextAnalysis.t18BpeMerges(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("t30 hashing TF: buckets and weights match an in-test reference") {
    import spark.implicits._
    // two docs, three tokens; truth computes the SAME md5-bucket and
    // log2-tick arithmetic in plain JVM code
    val docs = Seq((0L, "aa aa bb", "en", "s", 8L), (1L, "bb cc", "en", "s", 5L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_htf").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"htf:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % TextAnalysis.HtfBuckets
    }
    def idfT(df: Long, n: Long): Long =
      math.floor(math.log((n + 1.0) / (df + 1.0)) / math.log(2.0) *
        TextAnalysis.HtfScale + 0.5).toLong
    // n=2; df: aa=1, bb=2, cc=1
    val expect = Seq(
      (0L, bucket("aa"), 2L * idfT(1, 2)), (0L, bucket("bb"), 1L * idfT(2, 2)),
      (1L, bucket("bb"), 1L * idfT(2, 2)), (1L, bucket("cc"), 1L * idfT(1, 2)))
      .groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.map(_._3).sum }
    val got = TextAnalysis.t30HashingTf(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect, s"hashed weights drift: $got vs $expect")
    // smoothed IDF keeps bb (df = n) at exactly 0 ticks... unless the
    // smoothing floor rounds below: log2(3/3) = 0 → 0 ticks, present
    assert(got((0L, bucket("bb"))) == 0L)
    // corpus: at most HtfBuckets buckets per doc, deterministic
    val c = TextAnalysis.t30HashingTf(spark, sfDir).collect()
    assert(c.groupBy(_.getLong(0)).values
      .forall(_.length <= TextAnalysis.HtfBuckets))
    assert(c.toSeq == TextAnalysis.t30HashingTf(spark, sfDir).collect().toSeq)
  }

  test("t29 chi2 select: perfect separation scores exactly N ticks") {
    import spark.implicits._
    // 5 'en' docs all containing "alpha", 5 'fr' docs all containing
    // "beta", every doc containing "common". Perfect separation:
    // χ²(alpha) = N = 10 exactly (per-class num = ±n_w·n_l = ±50 →
    // term = (2500 div (5·5))·2²⁰ div 5 = 100·2²⁰/5 = 20·2²⁰ each).
    // "common" has n_w = N → excluded; "rare" sits below the df floor.
    val docs = (0L to 4L).map(i => (i, "alpha common", "en", "s", 12L)) ++
      (5L to 9L).map(i => (i, "beta common" + (if (i == 9L) " rare" else ""),
        "fr", "s", 12L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_chi2sel").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.t29Chi2Select(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set("alpha", "beta"),
      s"exactly the two separating tokens: ${out.keySet}")
    assert(out("alpha") == ((5L, 10L * 1048576L)),
      s"perfect separation must score N ticks, got ${out("alpha")}")
    assert(out("beta") == ((5L, 10L * 1048576L)))
    // corpus: top-k bounded, scores non-increasing, deterministic
    val c = TextAnalysis.t29Chi2Select(spark, sfDir).collect()
    assert(c.length <= TextAnalysis.Chi2SelTopK && c.nonEmpty)
    assert(c.map(_.getLong(2)).sliding(2).forall(p =>
      p.length < 2 || p.head >= p.last), "chi2 must be non-increasing")
    assert(c.toSeq == TextAnalysis.t29Chi2Select(spark, sfDir).collect().toSeq)
  }

  test("t31: boosting reduces SSE monotonically and beats the constant fit") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.t31GbtStumps(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // SSE non-increasing round over round (the L2 boosting invariant:
    // every leaf step is a half-step toward the residual mean)
    val sse = rows.map(_.getLong(9))
    assert(sse.zip(sse.tail).forall { case (a, b) => b <= a }, sse.toSeq)
    // round 1 must strictly beat the constant-f0 baseline SSE
    val f = TextAnalysis.docFeatures(spark, sfDir)
      .select("v2").collect().map(_.getLong(0))
    val f0 = rows.head.getLong(8)
    val base = f.map(y => (y - f0) * (y - f0)).sum
    assert(sse.head < base, s"round-1 SSE ${sse.head} !< baseline $base")
    // splits are well-formed: bins inside the grid, positive gain
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < 16)
      assert(r.getLong(5) > 0L)
      assert(Set("n_chars", "distinct_ratio").contains(r.getString(1)))
    }
    // deterministic
    assert(rows.toSeq == TextAnalysis.t31GbtStumps(spark, sfDir).collect().toSeq)
  }
}
