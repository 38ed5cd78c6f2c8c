package graft.sources

import graft.Ckpt._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Non-parquet sources and layout-aware sinks (SURVEY §2 infra).
  *
  * Scale posture baked in:
  *  - reads take an EXPLICIT schema — schema inference is a full extra
  *    pass over the data (unacceptable at 100 TB) and silently widens
  *    types; FAILFAST surfaces corrupt records instead of nulling them.
  *  - partitioned writes give the reader partition pruning (a filter
  *    on the partition column skips whole directories);
  *  - bucketed writes give co-located joins: two tables bucketed on
  *    the same key with the same bucket count join WITHOUT a shuffle.
  */
object Sources {

  /** CSV read with explicit schema; header expected by default. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON-lines read with explicit schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** JSON-lines read that QUARANTINES corrupt records instead of
    * failing the job: PERMISSIVE mode parses what it can and routes
    * each unparseable line, verbatim, into `corruptCol` (the parsed
    * columns of that row are null). The strict [[readJson]] is the
    * right default — silent nulling hides data bugs — but at 100 TB
    * one malformed line must not kill a multi-hour ingest: this
    * variant lets the pipeline `filter(col(corruptCol).isNotNull)`
    * into a dead-letter sink and alert on its count instead.
    *
    * Dead-letter caveat (Spark restriction): a query that references
    * ONLY the corrupt-record column of a raw JSON scan throws
    * `AnalysisException` — Spark forbids it because the parser skips
    * corrupt-record bookkeeping when no data column is needed. So
    * `df.filter(col(corruptCol).isNotNull).count()` on the raw frame
    * fails. Either `df.cache()` first (the frame is then no longer a
    * raw JSON scan) or carry at least one data column into the
    * dead-letter sink (`select(corruptCol, <any data col>)`), which
    * is what a real quarantine sink does anyway.
    */
  def readJsonLenient(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** CSV write (header on), for round-trip interchange. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-lines write. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC read with explicit schema — the other columnar interchange
    * format next to parquet; same pushdown/pruning behavior.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC write. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Raw text read — a top ingest format for LLM corpora. Line mode
    * (default) yields one row per line in a single `value` column;
    * `wholetext = true` yields one row per FILE, the shape for
    * document-per-file corpora. Line mode splits at arbitrary byte
    * offsets, so it parallelizes over 100 TB like any file scan;
    * wholetext makes one task per file — partition the corpus into
    * many files, and never wholetext multi-GB files.
    */
  def readText(spark: SparkSession, path: String, wholetext: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholetext.toString).text(path)

  /** Text write: exactly one string column, one row per line. Rows
    * containing newlines will NOT round-trip through a line-mode read
    * — strip or escape them first.
    */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  /** LibSVM read — the one reference data-source format that had no
    * counterpart here (reference: /root/reference/mllib/src/main/
    * scala/org/apache/spark/ml/source/libsvm/LibSVMRelation.scala:1):
    * lines of `label idx:val idx:val …` with 1-BASED strictly
    * ascending indices. Output one row per line: (label DOUBLE,
    * indices ARRAY<INT> — kept 1-based, the file convention —
    * values ARRAY<DOUBLE>, `corruptCol` STRING). Malformed lines
    * (unparseable label, non-`i:v` token, non-positive or
    * non-strictly-ascending indices) carry the RAW line in
    * `corruptCol` with null data columns — the [[readJsonLenient]]
    * quarantine convention, so pipelines dead-letter instead of
    * silently nulling.
    *
    * Pure codegen'd parse (split/transform/cast — no UDF), riding
    * the line-mode text scan, so it parallelizes over 100 TB like
    * any file scan. Blank lines are dropped (the reference skips
    * them too).
    */
  def readLibsvm(spark: SparkSession, path: String,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    import org.apache.spark.sql.functions._
    val pairRe = "^[0-9]+:[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
    readText(spark, path)
      .filter(trim(col("value")) =!= "")
      .withColumn("toks", split(trim(col("value")), "\\s+"))
      .withColumn("label", expr("try_cast(element_at(toks, 1) AS DOUBLE)"))
      .withColumn("pairs", expr("slice(toks, 2, size(toks) - 1)"))
      .withColumn("idx", expr(
        "transform(pairs, p -> try_cast(split_part(p, ':', 1) AS INT))"))
      .withColumn("vals", expr(
        "transform(pairs, p -> try_cast(split_part(p, ':', 2) AS DOUBLE))"))
      // The token-format gate runs through the Column API (`rlike` on
      // a Scala string), NOT through expr("... rlike '<re>'"): the
      // SQL string literal layer unescapes backslashes, which would
      // turn \. into the any-char wildcard and let tokens like
      // `1:2x3` through the gate. Belt and braces, every parsed value
      // must also be non-NULL — an unparseable value always
      // quarantines, never silently nulls inside `values`.
      .withColumn("ok",
        col("label").isNotNull &&
          forall(col("pairs"), p => p.rlike(pairRe)) &&
          expr("forall(idx, i -> i IS NOT NULL AND i >= 1)") &&
          expr("forall(vals, v -> v IS NOT NULL)") &&
          expr("size(array_distinct(idx)) = size(idx)") &&
          expr("idx = array_sort(idx)"))
      .select(
        when(col("ok"), col("label")).as("label"),
        when(col("ok"), col("idx")).as("indices"),
        when(col("ok"), col("vals")).as("values"),
        when(!col("ok"), col("value")).as(corruptCol))
  }

  /** LibSVM write: (label, indices, values) rows → `label i:v …`
    * lines through [[writeText]]. Indices are written as given
    * (1-based by the read's convention — keep them that way).
    */
  def writeLibsvm(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    writeText(
      df.select(concat_ws(" ",
        col("label").cast("string"),
        expr("array_join(zip_with(indices, values, (i, v) -> " +
          "concat(CAST(i AS STRING), ':', CAST(v AS STRING))), ' ')"))
        .as("value")),
      path)
  }

  /** Edge-list read — the reference's GraphLoader surface (reference:
    * /root/reference/graphx/src/main/scala/org/apache/spark/graphx/
    * GraphLoader.scala:28: whitespace-separated `src dst` lines,
    * `#`-comment lines skipped): one (src, dst) LONG row per edge,
    * ready for the g01–g19 operators (which take exactly this frame).
    * Malformed lines (wrong arity, unparseable ids) quarantine into
    * `corruptCol` verbatim — the [[readLibsvm]] convention; comment
    * and blank lines are dropped, not quarantined (they are legal in
    * the format). Codegen'd parse on the line-mode text scan — 100 TB
    * parallelism for free, no UDF.
    */
  def readEdgeList(spark: SparkSession, path: String,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    import org.apache.spark.sql.functions._
    readText(spark, path)
      .filter(trim(col("value")) =!= "" &&
        !trim(col("value")).startsWith("#"))
      .withColumn("toks", split(trim(col("value")), "\\s+"))
      .withColumn("ok", expr("size(toks) = 2") &&
        expr("try_cast(element_at(toks, 1) AS LONG) IS NOT NULL") &&
        expr("try_cast(element_at(toks, 2) AS LONG) IS NOT NULL"))
      .select(
        when(col("ok"), expr("try_cast(element_at(toks, 1) AS LONG)"))
          .as("src"),
        when(col("ok"), expr("try_cast(element_at(toks, 2) AS LONG)"))
          .as("dst"),
        when(!col("ok"), col("value")).as(corruptCol))
  }

  /** Edge-list write: (src, dst) rows → `src dst` lines. */
  def writeEdgeList(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    writeText(df.select(concat_ws(" ",
      col("src").cast("string"), col("dst").cast("string")).as("value")), path)
  }

  /** JDBC read — dimension/metadata tables routinely live in an
    * RDBMS. `partitioning = Some((column, lower, upper, n))` issues n
    * range-predicate queries in parallel (the scale path: a single
    * unpartitioned JDBC read is ONE task pulling the whole table
    * through one connection); bounds only steer the split points, rows
    * outside them are still read. Predicates on the result push down
    * to the database as WHERE clauses where the dialect allows.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty,
      partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    partitioning.fold(withProps) { case (column, lower, upper, n) =>
      withProps.option("partitionColumn", column)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
    }.load()
  }

  /** Avro read with explicit schema — the row-oriented interchange
    * format (Kafka payloads, log shipping). Columnar pruning does NOT
    * apply the way it does for parquet/orc: Avro is row-major, so a
    * 2-column projection still reads whole records — use it for
    * interchange, convert to parquet for analytics.
    */
  /** The avro connector classes ship inside spark-sql but without the
    * DataSourceRegister service entry, so the "avro" short name does
    * not resolve — the full class name does.
    */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(AvroFormat).load(path)

  /** Avro write. */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(AvroFormat).save(path)

  /** Binary-file read — the multimodal INGEST edge: each matching
    * file becomes one row (path, modificationTime, length, content:
    * binary), the shape [[graft.operators.Multimodal]] consumes
    * (blobs stay opaque to Catalyst; metadata columns prune without
    * touching bytes). `pathGlob` filters by name pattern
    * (e.g. "*.png") BEFORE any read. One task per file — media
    * corpora should be many files, and multi-GB blobs belong in a
    * packed format, not single files.
    */
  def readBinaryFiles(spark: SparkSession, path: String,
      pathGlob: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    pathGlob.fold(base)(g => base.option("pathGlobFilter", g)).load(path)
  }

  /** XML read (built into Spark 4) — config/feed interchange.
    * `rowTag` names the repeated element that becomes a row; schema
    * explicit as everywhere (inference reads the data twice and
    * guesses). Row-major like Avro: convert to parquet for analytics.
    */
  def readXml(spark: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).xml(path)

  /** XML write: one `rowTag` element per row under `rootTag`. */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).xml(path)

  /** JDBC write — the return path for [[readJdbc]] (publishing a
    * result table to an RDBMS). `numPartitions` caps concurrent
    * connections: every partition opens one, so an unthrottled 10k-
    * partition frame is a 10k-connection stampede on the database.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: Map[String, String] = Map.empty,
      maxConnections: Int = 8): Unit = {
    require(maxConnections >= 1, s"maxConnections must be >= 1, got $maxConnections")
    // repartition, not coalesce: coalesce installs no shuffle barrier,
    // so it would cap the parallelism of the ENTIRE upstream
    // computation at maxConnections — a heavy frame would compute on 8
    // tasks. The one extra shuffle confines the cap to the write stage.
    val capped =
      if (df.rdd.getNumPartitions > maxConnections) df.repartition(maxConnections)
      else df
    val base = capped.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(base) { case (w, (k, v)) => w.option(k, v) }
      .mode(SaveMode.Overwrite)
      .save()
  }

  /** Hive-style partitioned parquet write: one directory per value of
    * the partition columns. Keep partition-column cardinality modest
    * (≤ ~10⁴ directories) — per-key file explosion is its own scale
    * failure.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Backfill/replace ONLY the partitions present in `df`, leaving
    * every other partition untouched — dynamic partition overwrite,
    * the write mode a daily pipeline uses to re-run one day of a
    * years-deep table without clobbering the rest. (Static overwrite
    * mode — the Spark default — would delete ALL partitions first.)
    * The conf is set per-write and restored to its previous EFFECTIVE
    * value afterwards: for a registered SQLConf `conf.get` returns the
    * default when unset, so a never-set conf comes back pinned to that
    * default — observably identical for every conf reader (an
    * `unset`-based restore would be dead code, since `getOption` also
    * reports the registered default).
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    finally spark.conf.set(key, prev)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files — the maintenance pass every long-lived
    * table needs (streaming sinks and fine-grained partitioning
    * accrete thousands of KB-sized files, and scan cost then is
    * dominated by per-file open/seek, not bytes). File count comes
    * from the CURRENT on-disk footprint via the Hadoop FileSystem, so
    * the same call works on HDFS/object stores. Returns the target
    * file count.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes >= 1, s"targetFileBytes must be >= 1")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // in-place compaction would be data loss: the scan is lazy, so
    // mode(Overwrite) on the SAME path deletes the source files out
    // from under the read. Compare fully-qualified URIs, not strings.
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Hadoop Path keeps ".." segments, so qualify THEN URI-normalize
    require(fs.makeQualified(path).toUri.normalize() !=
        outFs.makeQualified(outPath).toUri.normalize(),
      s"compactParquet cannot write in place: outDir == inDir ($inDir)")
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nFiles
  }

  /** Keyed upsert (SCD-1 MERGE) into a partitioned parquet table:
    * rows of `updates` replace target rows with the same `keyCol`,
    * new keys append — confined to the partitions the updates
    * actually touch. The non-touched history is NEVER read or
    * written: touched partition values collapse to a small distinct
    * frame, the target read prunes to those partitions (an IN filter
    * on the partition column — the standard partition-pruning path
    * SourcesSpec proves for partitioned reads; the upsert spec
    * additionally proves untouched partitions survive byte-for-byte),
    * survivors come from one anti-join, and the rewrite goes through
    * [[overwritePartitions]] (dynamic mode). This is the
    * compose-from-primitives MERGE for plain parquet — a table format
    * (Delta/Iceberg) adds ACID on top, but the data movement is
    * exactly this.
    *
    * The anti-join build side is the updates' key set (small by the
    * incremental-batch assumption); updates spanning a partition's
    * whole key space still rewrite just that partition. Caller
    * guarantees `updates` has the target's schema.
    *
    * Key contract: the merged table must have at most one row per
    * key, so a batch carrying TWO rows for one key (a key changed
    * twice inside one CDC window) needs `versionCol` — the
    * monotonically-increasing change ordinal (LSN / change ts) every
    * real CDC feed carries — and only the highest-version row per
    * key lands (struct-max argmax, deterministic). Without
    * `versionCol` there is no defensible winner, so duplicate keys
    * FAIL LOUD rather than landing both rows silently.
    *
    * Partition-stability precondition: `partitionCol` must be a
    * stable function of the key (ingest date, hash bucket — the
    * normal layouts). An update that MOVES a key to a new partition
    * would leave the old partition's row in place, because only
    * touched partitions are read — replacing that silent duplicate
    * with correctness requires reading every partition the key might
    * inhabit, i.e. the full-table merge a table format (Delta/
    * Iceberg) runs when it cannot prune. Partition-moving updates
    * are out of contract here.
    */
  def upsertParquet(spark: SparkSession, targetDir: String, updates0: DataFrame,
      keyCol: String, partitionCol: String,
      versionCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.{col, broadcast, count, countDistinct, lit, max, struct}
    val updates = versionCol match {
      case Some(v) =>
        // last-writer-wins per key: max over (version, remaining
        // cols) structs — deterministic even on version ties (the
        // remaining fields break them by value)
        val others = updates0.columns.filterNot(_ == keyCol).toSeq
        val ordered = col(v) +: others.filterNot(_ == v).map(col)
        updates0.groupBy(col(keyCol))
          .agg(max(struct(ordered: _*)).as("__r"))
          .select(col(keyCol) +: others.map(c => col(s"__r.$c").as(c)): _*)
          .select(updates0.columns.map(col).toIndexedSeq: _*)
      case None =>
        val Array(n, nk) = updates0
          .agg(count(lit(1)), countDistinct(col(keyCol))).collect()(0)
          .toSeq.map(_.asInstanceOf[Long]).toArray
        require(n == nk,
          s"upsertParquet: updates carry duplicate keys ($n rows, $nk distinct " +
            s"$keyCol) — pass versionCol to resolve last-writer-wins")
        updates0
    }
    // Bootstrap: the very first batch against a not-yet-existing
    // target IS the table — write it directly instead of failing
    // inside spark.read.parquet with a path-not-found that points at
    // the wrong layer.
    val targetExists = {
      val p = new org.apache.hadoop.fs.Path(targetDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).nonEmpty
    }
    if (!targetExists) {
      // An empty bootstrap batch would write a parquet-less dir (only
      // _SUCCESS): targetExists is then true on the next batch and
      // spark.read.parquet fails with a schema-inference error —
      // exactly the wrong-layer failure the bootstrap branch exists
      // to avoid. Same loud contract as the merge path's
      // `touched.nonEmpty` require.
      require(!updates.isEmpty, "upsertParquet: updates frame is empty")
      updates.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol).parquet(targetDir)
      return
    }
    // The touched-partition values come to the driver (they drive the
    // pruning filter below) — bounded by the incremental-batch
    // assumption. A mis-keyed updates frame (e.g. partitionCol
    // accidentally the KEY column) would collect millions of values
    // and OOM the driver; fail loud at a limit far above any real
    // incremental batch instead.
    val MaxTouchedPartitions = 100000
    val touched = updates.select(col(partitionCol)).distinct()
      .limit(MaxTouchedPartitions + 1)
      .collect().map(_.get(0)).toSeq
    require(touched.nonEmpty, "upsertParquet: updates frame is empty")
    require(touched.size <= MaxTouchedPartitions,
      s"upsertParquet: updates touch > $MaxTouchedPartitions distinct " +
        s"'$partitionCol' values — is $partitionCol really the partition " +
        "column? (incremental batches touch few partitions)")
    val target = spark.read.parquet(targetDir)
      .filter(col(partitionCol).isin(touched: _*))
    val keys = updates.select(col(keyCol)).distinct()
    val survivors = target.join(broadcast(keys), Seq(keyCol), "left_anti")
    // materialize BEFORE the write: the merged frame reads the very
    // files the overwrite replaces (lazy scan + same-path overwrite is
    // the compactParquet in-place data-loss trap, and Spark's
    // overwrite-while-reading detection does not cover path reads).
    // The checkpoint truncates lineage to materialized blocks, sized
    // to the TOUCHED partitions only — the incremental-batch regime
    // this operator is for.
    val merged = survivors.unionByName(updates).ckpt(true)
    overwritePartitions(merged, targetDir, Seq(partitionCol))
  }

  /** Bucketed + sorted managed table: `nBuckets` files per partition,
    * rows hash-distributed by `bucketCol` and sorted within buckets —
    * equi-joins between tables bucketed identically need no exchange.
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Z-order (Morton) interleave of two key columns into one
    * clustering key: each key is clamped to its low 16 bits, spread
    * to alternate bit positions with the standard mask-shift ladder,
    * and interleaved (a takes the even bits, b the odd). Rows sorted
    * by this key are clustered in BOTH dimensions at once, so
    * parquet row-group min/max stats stay tight on both columns —
    * the data-skipping layout for scans that filter sometimes on a,
    * sometimes on b (a single-column sort gives pruning only on the
    * leading column). Pure integer column expression, identical in
    * DuckDB (the q47 oracle evaluates the same ladder).
    */
  def zOrderKey(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft}
    def spread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val x0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
      x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-order-clustered parquet write: range-partition on the Morton
    * key of (colA, colB) into `nFiles` output files, sort within each
    * partition by the key, drop the key column from the data. The
    * reader's row-group pruning then skips files/row-groups on
    * predicates over EITHER column — the maintenance/compaction pass
    * a 100 TB table runs so that ad-hoc scans stop reading
    * everything. The clustering win is measured in the spec: per-file
    * (max-min) key ranges shrink vs an unclustered write of the same
    * data.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zOrderKey(col(colA), col(colB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
