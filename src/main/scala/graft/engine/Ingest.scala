package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5/S6 + F9 + O5: archive discovery, ZIP extraction, CSV ingestion.
  *
  * Reference: `zip_processing.py:28-84` (member enumeration, skip
  * `__MACOSX/` and `._*`, one-level nested-zip recursion) and
  * `parser.py:4-43` (filename regexes; note the module defines
  * `parse_file_date` twice — the second definition, returning
  * (None, None) on miss, wins and is the one modeled here).
  *
  * Scale note: member extraction happens wherever the bytes are —
  * at test scale a local ZipInputStream; at 100 TB you pre-extract to
  * object storage (or read via `binaryFile` + flatMap) so each CSV
  * becomes its own split. Normalization (P1-P4) is per-member because
  * header generations differ across a decade of files.
  */
object Ingest {

  /** One archive = one logical load unit (year, optional month). */
  final case class Archive(path: String, year: String, month: Option[String]) {
    /** chronological key (`ingestion.py:34,105-109`; unknown → last) */
    def sortKey: Long =
      try { year.toLong * 100 + month.map(_.toLong).getOrElse(0L) }
      catch { case _: NumberFormatException => Long.MaxValue }
  }

  private val zipName = """^(\d{4})(\d{2})?-citibike-tripdata(\.csv)?\.zip$""".r

  /** F9: `parse_file_name` (`parser.py:30-36`). */
  def parseFileName(name: String): Option[(String, Option[String])] =
    name match {
      case zipName(y, m, _) => Some((y, Option(m)))
      case _ => None
    }

  /** S2/S5 (+S1 remote form): list archives in a directory, keep
    * matching names (drops `JC-*`, html, etc. by regex), chronological
    * order. Scheme-agnostic via the Hadoop `FileSystem` API — a bare
    * path or `file://` URI lists locally; `s3a://bucket/prefix` (the
    * reference's `s3://tripdata` listing, `ingestion.py:61-90`) resolves
    * through the s3a connector with the same code path. */
  def listArchives(dir: String,
                   conf: org.apache.hadoop.conf.Configuration =
                     new org.apache.hadoop.conf.Configuration()): Seq[Archive] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.exists(p)) fs.listStatus(p).toSeq.filter(_.isFile)
      else Seq.empty
    files.flatMap { st =>
      parseFileName(st.getPath.getName).map { case (y, m) =>
        Archive(st.getPath.toString, y, m)
      }
    }.sortBy(_.sortKey)
  }

  /** S6: extract CSV members (bytes) from a ZIP, skipping macOS junk,
    * recursing one level into nested zips (`zip_processing.py:28-84`). */
  def extractCsvMembers(zipBytes: Array[Byte], depth: Int = 0): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        val name = entry.getName
        val base = name.substring(name.lastIndexOf('/') + 1)
        val junk = name.startsWith("__MACOSX/") || base.startsWith("._") ||
          entry.isDirectory
        if (!junk && name.toLowerCase.endsWith(".csv")) {
          out += ((name, readAll(zin)))
        } else if (!junk && name.toLowerCase.endsWith(".zip") && depth == 0) {
          out ++= extractCsvMembers(readAll(zin), depth = 1)
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  private def readAll(zin: ZipInputStream): Array[Byte] = {
    val buf = new Array[Byte](64 * 1024)
    val bos = new ByteArrayOutputStream()
    var n = zin.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = zin.read(buf) }
    bos.toByteArray
  }

  /** Shared per-member CSV parse (univocity — the parser Spark's own
    * CSV source uses, so quoted commas and embedded newlines are
    * handled): header normalized via the synonym map, records surfaced
    * as canonical-order string arrays (null for absent columns).
    * Whitespace is preserved and quoted-empty fields stay "" (matching
    * the reference's Arrow reader: no trimming, empties as written). */
  private[engine] def parseMember(bytes: Array[Byte]): Iterator[org.apache.spark.sql.Row] = {
    val names = TripSchema.canonical.fieldNames
    val settings = new com.univocity.parsers.csv.CsvParserSettings
    settings.setMaxCharsPerColumn(-1)
    settings.setMaxColumns(512)
    settings.setIgnoreLeadingWhitespaces(false)
    settings.setIgnoreTrailingWhitespaces(false)
    settings.setEmptyValue("")
    val parser = new com.univocity.parsers.csv.CsvParser(settings)
    val it = parser.iterate(
      new java.io.ByteArrayInputStream(bytes), "UTF-8").iterator()
    if (!it.hasNext) Iterator.empty
    else {
      val header = it.next().map(c =>
        Normalize.cleanColumnName(Option(c).getOrElse("")))
      val idx = names.map(n => header.indexOf(n))
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = it.hasNext
        def next(): org.apache.spark.sql.Row = {
          val rec = it.next()
          org.apache.spark.sql.Row(idx.map { i =>
            if (i < 0 || i >= rec.length) null else rec(i)
          }.toIndexedSeq: _*)
        }
      }
    }
  }

  private val canonicalStringSchema = org.apache.spark.sql.types.StructType(
    TripSchema.canonical.fieldNames.map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.StringType)))

  /** S7 + U1: parse every CSV member of an archive and union the
    * normalized batches (`zip_processing.py:10-17` + `clean_up.py`).
    * Driver-side form — mirrors the reference's in-memory Arrow path;
    * fine for monthly archives, see [[readArchiveDistributed]] for the
    * executor-side form. Both paths share [[parseMember]], so their
    * CSV semantics are identical by construction. */
  def readArchive(spark: SparkSession, archive: Archive): DataFrame = {
    val local = asLocalFile(archive.path).getOrElse(
      throw new IllegalArgumentException(
        s"driver-side readArchive needs a local path, got ${archive.path}; " +
          "use readArchiveDistributed for remote schemes"))
    val zipBytes = java.nio.file.Files.readAllBytes(local.toPath)
    val members = extractCsvMembers(zipBytes)
    require(members.nonEmpty, s"no CSV members in ${archive.path}")
    val rows = members.iterator.flatMap { case (_, bytes) => parseMember(bytes) }
    Normalize.castCanonical(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), canonicalStringSchema))
  }

  /** Executor-side ingest: the archive bytes never touch the driver.
    * `binaryFiles` ships each ZIP to a task; members are extracted and
    * CSV-parsed there via [[parseMember]], and the typed cast chain runs
    * as ordinary expressions.
    *
    * Scale notes: parallelism is one task per archive — the right unit
    * when loading years of monthly files at once; at true 100 TB scale
    * CSVs would be pre-extracted so each member splits further.
    *
    * Fails fast on archives with no CSV members (cheap driver-side
    * central-directory check for local paths) rather than silently
    * loading zero rows and marking the period complete. */
  def readArchiveDistributed(spark: SparkSession, archive: Archive): DataFrame = {
    asLocalFile(archive.path).filter(_.isFile).foreach { f =>
      // local path: cheap metadata check, no decompression
      require(hasCsvMembers(f), s"no CSV members in ${archive.path}")
    }
    val rows = spark.sparkContext.binaryFiles(archive.path)
      .flatMap { case (_, pds) =>
        extractCsvMembers(pds.toArray()).iterator
          .flatMap { case (_, bytes) => parseMember(bytes) }
      }
    Normalize.castCanonical(spark.createDataFrame(rows, canonicalStringSchema))
  }

  /** A bare path or `file:` URI as a [[java.io.File]]; None for remote
    * schemes (s3a://, hdfs://, ...). */
  private def asLocalFile(path: String): Option[java.io.File] = {
    val uri = try new java.net.URI(path) catch {
      case _: java.net.URISyntaxException => return Some(new java.io.File(path))
    }
    uri.getScheme match {
      case null => Some(new java.io.File(path))
      case "file" => Some(new java.io.File(uri.getPath))
      case _ => None
    }
  }

  /** Central-directory scan: does the zip contain any non-junk .csv
    * member, or a nested .zip that could? */
  private def hasCsvMembers(f: java.io.File): Boolean = {
    val zf = try new java.util.zip.ZipFile(f) catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(s"unreadable archive: $f", e)
    }
    try {
      val es = zf.entries()
      var found = false
      while (!found && es.hasMoreElements) {
        val e = es.nextElement()
        val name = e.getName
        val base = name.substring(name.lastIndexOf('/') + 1)
        val junk = name.startsWith("__MACOSX/") || base.startsWith("._") ||
          e.isDirectory
        found = !junk && (name.toLowerCase.endsWith(".csv") ||
          name.toLowerCase.endsWith(".zip"))
      }
      found
    } finally zf.close()
  }
}
