package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Recommend

/** Value-level checks for the s13 ALS factorization — the oracle
  * pins cross-engine bit-parity of the ticks; these pin that the
  * ticks MEAN something: a planted low-rank matrix is actually
  * fitted, the solve is deterministic across runs, and the output
  * respects its own clamp/shape contract.
  */
class RecommendSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = TestSpark.spark

  /** SSE of u·v against r over the rating cells, plus Σr² (the
    * zero-model baseline).
    */
  private def sse(ratings: org.apache.spark.sql.DataFrame,
      users: org.apache.spark.sql.DataFrame,
      items: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val u = users.select(Seq(col("c")) ++
      (0 until Recommend.AlsRank).map(k => col(s"f$k").as(s"u$k")): _*)
    val v = items.select(Seq(col("s")) ++
      (0 until Recommend.AlsRank).map(k => col(s"f$k").as(s"v$k")): _*)
    val pred = (0 until Recommend.AlsRank)
      .map(k => col(s"u$k") * col(s"v$k")).reduce(_ + _)
    val row = ratings.join(u, "c").join(v, "s")
      .agg(sum(pow(col("r") - pred, 2)).as("sse"),
        sum(col("r") * col("r")).as("base"))
      .head()
    (row.getDouble(0), row.getDouble(1))
  }

  test("s13 ALS fits a planted low-rank matrix far below the zero baseline") {
    val sess = spark
    import sess.implicits._
    // planted rank-1: r(c,s) = a_c * b_s with small integer profiles
    val cells = for { c <- 1L to 40L; s <- 1L to 20L }
      yield (c, s, ((c % 4 + 1) * (s % 3 + 1)).toDouble)
    val ratings = cells.toDF("c", "s", "r").localCheckpoint(true)
    val (users, items) = Recommend.alsFactor(ratings)
    val (err, base) = sse(ratings, users, items)
    info(f"planted matrix: sse=$err%.2f zero-baseline=$base%.2f")
    assert(err < 0.05 * base,
      f"rank-4 ALS must fit a planted rank-1 matrix: sse=$err%.2f vs base=$base%.2f")
  }

  test("s13 ALS on the corpus: beats the zero model, deterministic, clamped") {
    val ratings = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        "o_orderkey")
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).cast("double").as("r"))
      .localCheckpoint(true)
    val (users, items) = Recommend.alsFactor(ratings)
    val (err, base) = sse(ratings, users, items)
    info(f"corpus: sse=$err%.2f zero-baseline=$base%.2f")
    assert(err < base, "the learned model must beat predicting zero")
    // deterministic: a second full run yields bit-identical ticks
    val out1 = Recommend.s13AlsRecommend(spark, sfDir).collect().toSeq
    val out2 = Recommend.s13AlsRecommend(spark, sfDir).collect().toSeq
    assert(out1 == out2, "two runs must be bit-identical")
    // shape + clamp contract
    val nC = ratings.select(col("c")).distinct().count()
    val nS = ratings.select(col("s")).distinct().count()
    assert(out1.size == nC + nS)
    val ticks = out1.flatMap(r =>
      (0 until Recommend.AlsRank).map(k => r.getLong(3 + k)))
    assert(ticks.forall(t =>
      t >= Recommend.AlsClampLo && t <= Recommend.AlsClampHi))
    // the clamp must not BIND on real data (a bound tick means the
    // model hit the saturation guard, not a fitted value)
    assert(ticks.forall(t =>
      t > Recommend.AlsClampLo && t < Recommend.AlsClampHi),
      "clamp binds on corpus factors — widen the grid")
  }

  test("s16 walk embeddings: the PPMI factorization fits and stays in clamp") {
    val ratings = graft.operators.Graph.walkPpmi(spark, sfDir)
      .select(col("a").as("c"), col("b").as("s"),
        (expr("(ppmi_ticks div 256)").cast("double") / 4096.0).as("r"))
      .localCheckpoint(true)
    val (rows, cols) = Recommend.alsFactor(ratings)
    val (err, base) = sse(ratings, rows, cols)
    info(f"ppmi matrix: sse=$err%.2f zero-baseline=$base%.2f")
    assert(err < base, "the embedding must beat predicting zero PPMI")
    val out1 = Recommend.s16WalkEmbeddings(spark, sfDir).collect().toSeq
    val out2 = Recommend.s16WalkEmbeddings(spark, sfDir).collect().toSeq
    assert(out1 == out2, "two runs must be bit-identical")
    val ticks = out1.flatMap(r =>
      (0 until Recommend.AlsRank).map(k => r.getLong(4 + k)))
    assert(ticks.forall(t =>
      t > Recommend.AlsClampLo && t < Recommend.AlsClampHi),
      "clamp binds on embedding factors — widen the grid")
    // both sides of every rated node report
    assert(out1.map(_.getString(0)).distinct.sorted == Seq("col", "row"))
  }

  test("s15 biased MF: biases point the right way and beat raw ALS residuals") {
    val sess = spark
    import sess.implicits._
    // planted additive structure: r = 10 + rowEff(c) + colEff(s), no
    // interaction — exactly what the bias stages should absorb.
    val cells = for { c <- 1L to 30L; s <- 1L to 12L }
      yield (c, s, 10L + (c % 5) + 3L * (s % 3))
    val raw = cells.toDF("c", "s", "r").localCheckpoint(true)
    val mu = raw.agg(expr(s"(sum(r) * ${Recommend.AlsTicks}) div count(*)").as("m"))
    val bs = raw.crossJoin(broadcast(mu)).groupBy(col("s"))
      .agg(expr(s"sum(r * ${Recommend.AlsTicks} - m)").as("num"),
        count(lit(1)).as("nn"))
      .withColumn("bsb", expr(s"num div (nn + ${Recommend.BiasLambda})"))
    // items with the max column effect (s%3==2) must carry the largest
    // bias ticks; min-effect items (s%3==0) the smallest
    val byS = bs.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val hi = (1L to 12L).filter(_ % 3 == 2).map(byS)
    val lo = (1L to 12L).filter(_ % 3 == 0).map(byS)
    assert(hi.min > lo.max,
      s"high-effect items must out-bias low-effect ones: $byS")
    // corpus: deterministic, bias-joined shape, ticks within clamp
    val out1 = Recommend.s15BiasedMf(spark, sfDir).collect().toSeq
    val out2 = Recommend.s15BiasedMf(spark, sfDir).collect().toSeq
    assert(out1 == out2, "two runs must be bit-identical")
    assert(out1.nonEmpty)
    assert(out1.head.schema.fieldNames.toSeq == Seq("node_type", "entity_key",
      "n_rated", "bias_ticks") ++
      (0 until Recommend.AlsRank).map(k => s"f${k}_ticks"))
    val fTicks = out1.flatMap(r =>
      (0 until Recommend.AlsRank).map(k => r.getLong(4 + k)))
    assert(fTicks.forall(t =>
      t > Recommend.AlsClampLo && t < Recommend.AlsClampHi))
  }

  test("t23/t24 topics recover a planted two-block corpus") {
    import spark.implicits._
    // two topics as COUNT PROFILES over a SHARED vocabulary (the LDA
    // notion: a topic is a distribution over terms, and every cell
    // is observed so the least-squares objective constrains the full
    // matrix): topic-A docs use alpha terms 4x and beta terms 1x,
    // topic-B docs the reverse. Recovery = reconstructed affinity
    // doc·term tracks the planted profile (own-topic terms ~4,
    // other-topic terms ~1).
    val aV = (0 until 6).map(i => s"alpha$i")
    val bV = (0 until 6).map(i => s"beta$i")
    def text(hi: Seq[String], lo: Seq[String]) =
      (hi.flatMap(t => Seq.fill(4)(t)) ++ lo).mkString(" ")
    val docs = (0L until 10L).map(i => (i, text(aV, bV), "en", "s", 30L)) ++
      (10L until 20L).map(i => (i, text(bV, aV), "de", "s", 30L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_topics").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val (docF, termF) = Recommend.topicFactors(spark, tmp)
    val dv = docF.collect().map(r => r.getLong(0) ->
      (0 until Recommend.AlsRank).map(k =>
        r.getDouble(r.fieldIndex(s"f$k")))).toMap
    val tv = termF.collect().map(r => r.getString(0) ->
      (0 until Recommend.AlsRank).map(k =>
        r.getDouble(r.fieldIndex(s"f$k")))).toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def meanAff(ds: Seq[Long], ts: Seq[String]) = {
      val vs = for (d <- ds; t <- ts) yield dot(dv(d), tv(t))
      vs.sum / vs.length
    }
    val aDocs = (0L until 10L).toSeq; val bDocs = (10L until 20L).toSeq
    val inA = meanAff(aDocs, aV); val inB = meanAff(bDocs, bV)
    val crossA = meanAff(aDocs, bV); val crossB = meanAff(bDocs, aV)
    info(f"affinity inA=$inA%.3f inB=$inB%.3f crossA=$crossA%.3f crossB=$crossB%.3f")
    // planted 4-vs-1 profile: require most of the contrast recovered
    assert(inA > crossA + 1.5 && inB > crossB + 1.5,
      "own-topic affinity must recover the planted 4x/1x contrast")
    // t24 structure on the planted corpus: 4 topics × exactly K rows,
    // contiguous ranks, per-topic non-increasing weights, vocab terms
    val tt = Recommend.t24TopicTerms(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(tt.length == Recommend.AlsRank * Recommend.TopicTermsK)
    val vocab = (aV ++ bV).toSet
    for (topic <- 0L until Recommend.AlsRank.toLong) {
      val rows = tt.filter(_._1 == topic).sortBy(_._2)
      assert(rows.map(_._2).toSeq == (1L to Recommend.TopicTermsK.toLong).toSeq)
      assert(rows.map(_._4).sliding(2).forall(p => p.head >= p.last),
        s"topic $topic weights must be non-increasing")
      assert(rows.forall(r => vocab.contains(r._3)))
    }
    // corpus: deterministic
    val x = Recommend.t24TopicTerms(spark, sfDir).collect().toSeq
    assert(x == Recommend.t24TopicTerms(spark, sfDir).collect().toSeq)
  }

  test("t28 word vectors: window semantics pinned; planted clusters separate") {
    import spark.implicits._
    // window semantics on a planted 5-token doc (duplicated so counts
    // clear the cnt>=2 scoring floor): |Δpos| <= 2 pairs exist, longer
    // spans don't, and counts are symmetric — checked against a
    // brute-force per-doc self-join, the quadratic construction the
    // positional equi-joins replace.
    val tmp1 = java.nio.file.Files.createTempDirectory("graft_wv1").toString
    Seq((0L, "a b c d e", "en", "s", 9L), (1L, "a b c d e", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp1/documents.parquet")
    val pairs = Recommend.wordPairs(spark, tmp1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("a", "b")) == 2 && pairs(("a", "c")) == 2,
      "distance-1 and distance-2 pairs must both count")
    assert(!pairs.contains(("a", "d")) && !pairs.contains(("a", "e")),
      "distance > 2 must not pair")
    assert(pairs.forall { case ((x, y), c) => pairs((y, x)) == c },
      "symmetrization must mirror every count")
    // brute-force parity: the equi-join build equals the |Δpos|<=2
    // self-join on this corpus
    graft.functions.registerAll(spark)
    val toks = graft.Tables.documents(spark, tmp1)
      .select(col("doc_id"), posexplode(
        call_function("word_grams", lower(col("text")), lit(1))))
      .toDF("doc_id", "pos", "tok")
    val brute = toks.as("x").join(toks.as("y"), "doc_id")
      .filter(col("x.pos") =!= col("y.pos") &&
        abs(col("x.pos") - col("y.pos")) <= Recommend.WordWindow)
      .groupBy(col("x.tok").as("a"), col("y.tok").as("b"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs == brute, "equi-join pair build must equal the self-join")
    // planted clusters: two disjoint 4-word vocabularies that never
    // share a window — the PPMI MATRIX must stay block-diagonal
    // (every scored pair within a cluster; the factorization only
    // constrains observed cells, so the semantic claim lives in the
    // matrix), and the factorization must fit those observed cells
    val xs = (0 until 4).map(i => s"x$i"); val ys = (0 until 4).map(i => s"y$i")
    def sent(v: Seq[String]) = Seq.fill(6)(v).flatten.mkString(" ")
    val docs = (0L until 8L).map(i =>
      (i, if (i < 4) sent(xs) else sent(ys), "en", "s", 50L))
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_wv2").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    val scored = Recommend.wordPpmi(spark, tmp2)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(scored.nonEmpty)
    assert(scored.forall { case (a, b) => a.head == b.head },
      "disjoint vocabularies must never produce a scored cross pair")
    assert(scored.exists(_._1.head == 'x') && scored.exists(_._1.head == 'y'),
      "both clusters must contribute scored pairs")
    // fit: the factorization beats the zero model on the observed cells
    val ratings = Recommend.wordPpmi(spark, tmp2)
      .select(col("a").as("c"), col("b").as("s"),
        (expr("(ppmi_ticks div 256)").cast("double") / 4096.0).as("r"))
      .localCheckpoint(true)
    val (rows2, cols2) = Recommend.alsFactor(ratings)
    val (err, base) = sse(ratings, rows2, cols2)
    info(f"word ppmi matrix: sse=$err%.2f zero-baseline=$base%.2f")
    assert(err < 0.5 * base,
      "the factorization must fit the observed PPMI cells")
    // corpus: both sides present, deterministic
    val a = Recommend.t28WordVectors(spark, sfDir).collect().toSeq
    assert(a == Recommend.t28WordVectors(spark, sfDir).collect().toSeq)
    assert(a.exists(_.getString(0) == "word") && a.exists(_.getString(0) == "ctx"))
  }

  test("s25 serve list equals a brute-force rescore of the factors") {
    val rows = Recommend.s25RecommendTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // brute force: collect both factor sides, score every pair with
    // the same exact tick dot, rank (score desc, supplier asc)
    val (users, items) = Recommend.purchaseFactors(spark, sfDir)
    def ticks(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Long]] =
      df.collect().map { r =>
        val n = r.schema.fieldNames.zipWithIndex.toMap
        r.getLong(n(df.columns.head)) ->
          (0 until Recommend.AlsRank).map(k => r.getLong(n(s"t$k"))).toArray
      }.toMap
    val u = ticks(users); val v = ticks(items)
    val truth = u.toSeq.flatMap { case (c, ut) =>
      v.toSeq.map { case (s, vt) =>
        (c, s, ut.zip(vt).map { case (a, b) => a * b }.sum)
      }.sortBy { case (_, s, sc) => (-sc, s) }
        .take(Recommend.RecTopK).zipWithIndex
        .map { case ((_, s, sc), i) => (c, i + 1L, s, sc) }
    }.sortBy(t => (t._1, t._2))
    assert(rows.toSeq == truth,
      s"serve list diverges from brute force (first got ${rows.take(3).toSeq})")
    // every customer serves exactly k dense ranks
    rows.groupBy(_._1).foreach { case (c, g) =>
      assert(g.map(_._2).sorted.toSeq ==
        (1L to Recommend.RecTopK.toLong), s"customer $c ranks ${g.toSeq}")
    }
  }

  test("t32 fold-in covers the corpus and matches the streaming serve model") {
    val sess = spark
    val rows = Recommend.t32TopicInfer(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (2 to 5).map(r.getLong).toVector))
    assert(rows.length == Tables.documents(spark, sfDir).count(),
      "resubstitution fold-in must cover every document")
    // dominant = argmax with ties to the smaller topic, from the row
    rows.foreach { case (d, dom, s) =>
      val best = s.zipWithIndex.maxBy { case (v, k) => (v, -k) }._2
      assert(dom == best, s"doc $d dominant $dom vs $best ($s)")
    }
    assert(rows.map(_._2).distinct.length > 1, "assignment must span topics")
    // cross-implementation: the streaming serve path's batch fold-in
    // (topicScoreStream + topicAssignBatch) assigns the same topics
    val terms = Recommend.topicFactors(spark, sfDir)._2
    val ticks = terms.select(Seq(org.apache.spark.sql.functions.col("s")
        .as("token")) ++
      (0 until Recommend.AlsRank).map(k =>
        org.apache.spark.sql.functions.col(s"t$k")): _*)
    val served = graft.streaming.StreamOps.topicAssignBatch(
        graft.streaming.StreamOps.topicScoreStream(
          Tables.documents(spark, sfDir), ticks))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (d, dom, _) =>
      assert(served(d) == dom, s"doc $d: t32 $dom vs serve ${served(d)}")
    }
    assert(rows.toSeq == Recommend.t32TopicInfer(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (2 to 5).map(r.getLong).toVector)).toSeq)
  }

  test("s28 SVD++ learns planted block structure and beats the mean baseline") {
    val sess = spark
    import sess.implicits._
    // two user/item blocks with different rating levels: block 1
    // rates high (8), block 2 rates low (2) — biases must separate
    // and the fitted model must beat predicting the global mean
    val cells =
      (for { c <- 1L to 6L; s <- 1L to 4L } yield (c, s, 8L)) ++
      (for { c <- 11L to 16L; s <- 11L to 14L } yield (c, s, 2L))
    val raw = cells.toDF("c", "s", "r").localCheckpoint(true)
    val out = Recommend.svdppCore(raw).collect()
    val users = out.filter(_.getString(0) == "c")
      .map(r => r.getLong(1) -> r).toMap
    val items = out.filter(_.getString(0) == "s")
      .map(r => r.getLong(1) -> r).toMap
    // every learned tick obeys the clamp
    out.foreach(r => (3 until r.length).foreach(i =>
      assert(math.abs(r.getLong(i)) <= Recommend.SvdppClamp)))
    // rebuild the predictor from the OUTPUT model alone: mu from the
    // ratings, wu from n_rated, ysum from the item y rows
    val muT = cells.map(_._3).sum * 4096L / cells.size
    def predict(c: Long, s: Long): Double = {
      val u = users(c); val i = items(s)
      val nC = u.getLong(2)
      val wu = math.floor(4096.0 / math.sqrt(nC.toDouble)).toLong
      val rated = cells.filter(_._1 == c).map(_._2)
      val ys = (0 until 4).map(k =>
        rated.map(j => items(j).getLong(8 + k)).sum)
      val z = (0 until 4).map(k => math.max(-65536L, math.min(65536L,
        u.getLong(4 + k) + (wu * ys(k)) / 4096L)))
      val qz = (0 until 4).map(k => i.getLong(4 + k) * z(k)).sum
      ((muT + u.getLong(3) + i.getLong(3)) * 4096L + qz).toDouble / 16777216.0
    }
    val sseModel = cells.map { case (c, s, r) =>
      val d = r.toDouble - predict(c, s); d * d }.sum
    val sseMean = cells.map { case (c, s, r) =>
      val d = r.toDouble - muT.toDouble / 4096.0; d * d }.sum
    info(f"sse model $sseModel%.2f vs mean baseline $sseMean%.2f")
    assert(sseModel < sseMean * 0.5,
      f"model must explain the block structure: $sseModel%.1f vs $sseMean%.1f")
    // bias separation: high-block biases above low-block ones
    val bHigh = (1L to 6L).map(users(_).getLong(3)).min
    val bLow = (11L to 16L).map(users(_).getLong(3)).max
    assert(bHigh > bLow, s"user bias separation: $bHigh vs $bLow")
    // corpus determinism
    val a = Recommend.s28Svdpp(spark, sfDir).collect().toSeq
    assert(a.nonEmpty && a == Recommend.s28Svdpp(spark, sfDir).collect().toSeq)
  }

  test("s24 implicit ALS separates planted preference blocks") {
    val sess = spark
    import sess.implicits._
    // two disjoint preference blocks, ONLY positive cells observed
    // (the implicit-feedback setting: absence is not a rating)
    val cells =
      (for { c <- 1L to 10L; s <- 1L to 5L } yield (c, s, 3.0)) ++
      (for { c <- 11L to 20L; s <- 6L to 10L } yield (c, s, 3.0))
    val ratings = cells.toDF("c", "s", "r").localCheckpoint(true)
    val (users, items) = Recommend.implicitFactor(ratings)
    val u = users.collect().map(r => r.getLong(0) ->
      (2 until 2 + 2 * Recommend.AlsRank).drop(Recommend.AlsRank)
        .map(i => r.getDouble(i)).toVector).toMap
    val v = items.collect().map(r => r.getLong(0) ->
      (2 until 2 + 2 * Recommend.AlsRank).drop(Recommend.AlsRank)
        .map(i => r.getDouble(i)).toVector).toMap
    def pred(c: Long, s: Long): Double =
      u(c).zip(v(s)).map { case (a, b) => a * b }.sum
    // in-block (observed-preference) predictions must dominate
    // cross-block (unobserved) ones — the Hu-Koren objective pushes
    // p-hat toward 1 on rated cells and 0 elsewhere
    val inBlock = (for { c <- 1L to 10L; s <- 1L to 5L } yield pred(c, s)) ++
      (for { c <- 11L to 20L; s <- 6L to 10L } yield pred(c, s))
    val cross = (for { c <- 1L to 10L; s <- 6L to 10L } yield pred(c, s)) ++
      (for { c <- 11L to 20L; s <- 1L to 5L } yield pred(c, s))
    val (mIn, mX) = (inBlock.sum / inBlock.size, cross.sum / cross.size)
    info(f"in-block mean $mIn%.3f cross-block mean $mX%.3f")
    assert(mIn > mX + 0.3, f"blocks not separated: $mIn%.3f vs $mX%.3f")
    // corpus: deterministic and clamped
    val a = Recommend.s24ImplicitAls(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.toSeq == Recommend.s24ImplicitAls(spark, sfDir).collect().toSeq)
    a.foreach { r =>
      (3 until 3 + Recommend.AlsRank).foreach { i =>
        assert(r.getLong(i) >= Recommend.AlsClampLo &&
          r.getLong(i) <= Recommend.AlsClampHi)
      }
    }
  }

  test("s32 item-kNN: serve equals the in-memory pipeline replication; " +
    "seen items excluded; co-purchase signal ranks first") {
    val sess = spark
    import sess.implicits._
    // planted baskets: items 1/2 co-purchased by two customers (high
    // similarity), 2/3 by one, 4 alone with 5 by one. Customer 40
    // owns only item 1 -> its top recommendation must be item 2.
    val planted = Seq(
      (10L, 1L, 2L), (10L, 2L, 1L),
      (20L, 1L, 1L), (20L, 2L, 2L),
      (30L, 2L, 1L), (30L, 3L, 1L),
      (40L, 1L, 1L),
      (50L, 4L, 1L), (50L, 5L, 2L))
    val got = Recommend.itemKnnServe(planted.toDF("c", "s", "r"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // the full pipeline replicated in memory with the same integer
    // contract: exact dots/norms, the same cosine->ticks floor, the
    // same (desc, id) tie orders and the same seen filter
    def truth(): Seq[(Long, Long, Long, Long)] = {
      val items = planted.map(_._2).distinct
      val n2 = items.map(i =>
        i -> planted.filter(_._2 == i).map(x => x._3 * x._3).sum).toMap
      val simt = (for {
        i <- items; j <- items if i < j
        dot = planted.groupBy(_._1).values.map { b =>
          (for (x <- b.find(_._2 == i); y <- b.find(_._2 == j))
            yield x._3 * y._3).getOrElse(0L)
        }.sum
        if dot > 0L
      } yield {
        val t = math.floor(dot.toDouble /
          math.sqrt(n2(i).toDouble * n2(j).toDouble) * 1048576.0 + 0.5).toLong
        Seq((i, j) -> t, (j, i) -> t)
      }).flatten.toMap
      val nbr = simt.groupBy(_._1._1).flatMap { case (i, m) =>
        m.toSeq.map { case ((_, j), t) => (i, j, t) }
          .sortBy { case (_, j, t) => (-t, j) }.take(Recommend.ItemKnnM)
      }.toSeq
      val seen = planted.map(x => (x._1, x._2)).toSet
      val custs = planted.map(_._1).distinct
      custs.flatMap { c =>
        val scores = planted.filter(_._1 == c).flatMap { case (_, i, r) =>
          nbr.filter(_._1 == i).map { case (_, j, t) => (j, r * t) }
        }.filterNot { case (j, _) => seen((c, j)) }
          .groupBy(_._1).map { case (j, xs) => (j, xs.map(_._2).sum) }.toSeq
        scores.sortBy { case (j, sc) => (-sc, j) }.take(Recommend.ItemKnnK)
          .zipWithIndex.map { case ((j, sc), k) => (c, k + 1L, j, sc) }
      }.sortBy(x => (x._1, x._2))
    }
    assert(got == truth(), s"pipeline drift:\n$got\nvs\n${truth()}")
    // the co-purchase signal: customer 40 (owns only item 1) gets
    // item 2 first; nobody is recommended an item they already hold
    assert(got.filter(_._1 == 40L).head._3 == 2L)
    val seen = planted.map(x => (x._1, x._2)).toSet
    got.foreach { case (c, _, j, _) => assert(!seen((c, j)), s"($c, $j) seen") }
    // corpus: non-empty, bounded rank, deterministic
    val a = Recommend.s32ItemKnn(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.forall(r => r.getLong(1) >= 1L &&
      r.getLong(1) <= Recommend.ItemKnnK))
    assert(a.toSeq == Recommend.s32ItemKnn(spark, sfDir).collect().toSeq)
  }

  test("s32 basket cap: a planted hot basket is excluded from the " +
    "similarity model (bounded pair count) but still served; the cap " +
    "does not bind on the corpus") {
    val sess = spark
    import sess.implicits._
    val cap = Recommend.ItemBasketCap
    // hot customer 99: items 1..cap+1 plus 500, 600, 601 -> basket
    // cap+4, must be dropped from the MODEL. Normal customers: (1,2)
    // co-purchased twice, (500,501) once; customer 4 owns 600 —
    // items 600/601 co-occur ONLY inside the hot basket.
    val hot = ((1L to (cap + 1L)) ++ Seq(500L, 600L, 601L))
      .map(i => (99L, i, 1L))
    val normal = Seq(
      (1L, 1L, 1L), (1L, 2L, 1L),
      (2L, 1L, 1L), (2L, 2L, 1L),
      (3L, 500L, 1L), (3L, 501L, 1L),
      (4L, 600L, 1L))
    val planted = hot ++ normal
    val df = planted.toDF("c", "s", "r")
    // the cap binds exactly on the hot basket
    val capped = Recommend.cappedRatings(df)
    assert(capped.filter(col("c") === 99L).count() == 0L)
    assert(capped.count() == planted.count(_._1 != 99L))
    // pair bound: the model's i<j co-occurrence frame is exactly the
    // two normal pairs — the hot basket's C(cap+4, 2) ≈ 33k pairs
    // never materialize
    val pairs = capped.select(col("c"), col("s").as("i"))
      .join(capped.select(col("c"), col("s").as("j")), "c")
      .filter(col("i") < col("j"))
      .select(col("i"), col("j")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (500L, 501L)))
    // serve reads the FULL ratings: the hot customer still receives
    // a recommendation (501 via its rated 500), and customer 4 gets
    // nothing (600's only co-occurrences lived in the dropped basket)
    val got = Recommend.itemKnnServe(df).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got.contains((99L, 501L)), s"hot customer unserved: $got")
    assert(!got.exists(_._1 == 4L), s"hot-basket edge leaked: $got")
    // the corpus never trips the cap at test SF, so the uncapped
    // oracle is provably unchanged (the g10 precedent)
    val ratings = Recommend.purchaseRatings(spark, sfDir)
    assert(Recommend.cappedRatings(ratings).count() == ratings.count())
  }

  test("t35 MAP-LDA: planted two-topic corpus recovers disjoint " +
    "dominant topics; a mixed doc SPLITS its posterior (the soft " +
    "semantics t32's argmax cannot express); corpus booleans; " +
    "deterministic") {
    import spark.implicits._
    // planted: docs 0-4 use only A-vocabulary, docs 5-9 only
    // B-vocabulary, doc 10 mixes both halves evenly; heavy counts so
    // three EM rounds separate cleanly
    val aTok = Seq("alpha", "amber", "arbor")
    val bTok = Seq("basil", "birch", "bream")
    val rows =
      (0 to 4).flatMap(d => aTok.map(t => (d.toLong, t, 40L))) ++
      (5 to 9).flatMap(d => bTok.map(t => (d.toLong, t, 40L))) ++
      (aTok ++ bTok).map(t => (10L, t, 20L))
    val tf = rows.toDF("doc_id", "token", "tf")
    val th = Recommend.ldaTheta(tf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    def argmax(a: Array[Double]): Int = a.indices.maxBy(a)
    // LDA with K > true topics is non-identifiable WITHIN a block
    // (several components may legitimately duplicate one word
    // distribution and split a doc's mass among themselves), so
    // every topic is first ASSIGNED to the block whose pure docs
    // give it more total mass; the falsifiable claims are CROSS-
    // block: the blocks' argmax topics disagree, and a pure doc
    // holds (almost) no posterior mass on the OTHER block's side —
    // a topic fitted to B-words assigns A-words vanishing likelihood
    val aTops = (0 until Recommend.LdaK).filter(k =>
      (0 to 4).map(d => th(d.toLong)(k)).sum >
        (5 to 9).map(d => th(d.toLong)(k)).sum).toSet
    val bTops = (0 until Recommend.LdaK).toSet -- aTops
    assert((0 to 4).map(d => argmax(th(d))).forall(aTops) &&
      (5 to 9).map(d => argmax(th(d))).forall(bTops),
      s"argmax crosses blocks: $aTops $bTops")
    def mass(d: Long, ts: Set[Int]): Double = ts.toSeq.map(th(d)).sum
    (0 to 4).foreach(d => assert(mass(d, bTops) < 0.1,
      s"A doc $d leaks to B topics: ${th(d.toLong).toSeq}"))
    (5 to 9).foreach(d => assert(mass(d, aTops) < 0.1,
      s"B doc $d leaks to A topics: ${th(d.toLong).toSeq}"))
    // the mixed doc holds REAL mass on both blocks' topic sets — the
    // posterior split a hard assignment cannot express
    assert(mass(10L, aTops) > 0.2 && mass(10L, bTops) > 0.2,
      s"mixed doc did not split: ${th(10L).toSeq} over $aTops/$bTops")
    // corpus: hashed grid + all four booleans at the spec SF
    val a = Recommend.t35LdaMap(spark, sfDir).collect()
    assert(a.length == Recommend.LdaK)
    a.foreach { r =>
      assert(r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) &&
        r.getBoolean(8), s"contract booleans failed: $r")
      assert(r.getLong(2) <= Recommend.LdaV)
    }
    // determinism: md5 seeds, literal phi init, fixed rounds
    val b = Recommend.t35LdaMap(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
