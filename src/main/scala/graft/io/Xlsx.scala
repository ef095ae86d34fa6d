package graft.io

import java.io.File
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Minimal XLSX (OOXML spreadsheet) reader — SURVEY.md §2.1 S3 / §7.2.
  *
  * The offline build has no spark-excel/POI, and the reference's only Excel
  * input is one small file read whole (`bronze_to_silver.py:52-55`), so a
  * JDK-only reader (ZipFile + StAX) is the right size: parses
  * `xl/sharedStrings.xml` and the first worksheet, returns rows of cell
  * strings (numbers as their raw text, shared strings resolved, inline
  * strings supported). Formula results come back as their cached value.
  *
  * XXE hardened: DTDs and external entities disabled.
  */
object Xlsx {

  /** Zip-bomb guard: a crafted archive can declare a tiny compressed entry
    * that inflates without bound (the central-directory size field is
    * attacker-controlled and therefore NOT trusted) — so the DECOMPRESSED
    * stream itself is metered and the parse aborts past `cap` bytes
    * instead of exhausting driver memory. */
  private def bounded(in: java.io.InputStream, cap: Long, what: String): java.io.InputStream =
    new java.io.FilterInputStream(in) {
      private var n = 0L
      private def bump(k: Long): Unit = if (k > 0) {
        n += k
        if (n > cap) throw new IllegalArgumentException(
          s"$what inflates past $cap bytes — refusing to parse (zip-bomb guard)")
      }
      override def read(): Int = { val b = super.read(); if (b >= 0) bump(1); b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val k = super.read(b, off, len); bump(k.toLong); k
      }
      override def skip(k: Long): Long = { val s = super.skip(k); bump(s); s }
    }

  private def reader(zip: ZipFile, name: String, cap: Long): Option[XMLStreamReader] =
    Option(zip.getEntry(name)).map { e =>
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.createXMLStreamReader(bounded(zip.getInputStream(e), cap, name))
    }

  /** Column letter(s) of an A1-style cell ref → 0-based column index. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def sharedStrings(zip: ZipFile, cap: Long): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    reader(zip, "xl/sharedStrings.xml", cap).foreach { r =>
      var inSi = false
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; sb.clear()
              case "t" if inSi => sb.append(r.getElementText)
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            out += sb.result(); inSi = false
          case _ =>
        }
      }
      r.close()
    }
    out.toIndexedSeq
  }

  /** First worksheet (sheet1) as rows of nullable cell strings.
    * `maxEntryBytes` caps each zip entry's DECOMPRESSED size (default
    * 64 MiB — far above any legitimate single-sheet workbook this reader
    * targets); a crafted archive that inflates past it fails loudly
    * instead of exhausting driver memory. */
  def readSheet(file: File, maxEntryBytes: Long = 1L << 26): Seq[Array[String]] = {
    val zip = new ZipFile(file)
    try {
      val shared = sharedStrings(zip, maxEntryBytes)
      val r = reader(zip, "xl/worksheets/sheet1.xml", maxEntryBytes)
        .getOrElse(throw new IllegalArgumentException(s"$file: no xl/worksheets/sheet1.xml"))
      val rows = ArrayBuffer.empty[ArrayBuffer[(Int, String)]]
      var row: ArrayBuffer[(Int, String)] = null
      var cellType = ""
      var cellCol = 0
      var inV = false
      var inIs = false
      val v = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = ArrayBuffer.empty
              case "c" =>
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
                cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
                  .getOrElse(if (row.isEmpty) 0 else row.last._1 + 1)
              case "v" => inV = true; v.clear()
              case "is" => inIs = true; v.clear()
              case "t" if inIs => v.append(r.getElementText)
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if inV =>
            v.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "row" => if (row != null) { rows += row; row = null }
              case "v" =>
                inV = false
                val raw = v.result()
                val value = cellType match {
                  case "s" => shared.lift(raw.trim.toInt).orNull
                  case "b" => if (raw.trim == "1") "true" else "false"
                  case _   => raw
                }
                if (row != null) row += ((cellCol, value))
              case "is" =>
                inIs = false
                if (row != null) row += ((cellCol, v.result()))
              case _ =>
            }
          case _ =>
        }
      }
      r.close()
      val width = if (rows.isEmpty) 0 else rows.iterator.map(rr => if (rr.isEmpty) 0 else rr.map(_._1).max + 1).max
      rows.map { rr =>
        val arr = new Array[String](width)
        rr.foreach { case (i, s) => if (i >= 0 && i < width) arr(i) = s }
        arr
      }.toSeq
    } finally zip.close()
  }
}
