package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** PDF embedded-image extraction — the DCT slice of the round-12
  * out-of-scope tail demoted: `/Subtype /Image` XObjects with
  * `/DCTDecode` are REAL baseline JPEGs, and the JDK decodes them
  * (`javax.imageio` ships a JPEG reader), so the only honest stub left
  * in the PDF filter chain is JPX (JPEG 2000 — no JDK codec). Raw
  * `/FlateDecode` images verify by exact sample-count arithmetic
  * (w·h·channels·bpc/8) after the same inflate the text path uses.
  *
  * The image census a training pipeline wants from a document corpus —
  * per image: declared vs decoded geometry, channel count, and a decode
  * flag that flips on any corruption anywhere in
  * build→store→scan→inflate/JPEG-decode. Dictionary walk rides the same
  * no-xref byte scan as text extraction ([[PdfTextExtractor.rawStreams]],
  * exact direct-`/Length` bounds — binary JPEG payloads legally contain
  * `endstream`); encrypted documents decrypt through [[PdfCrypt]] first,
  * same as text.
  */
object PdfImages {

  /** One image XObject: declared dims from the dict; decoded dims/
    * channels from the actual codec (JPEG) or sample arithmetic (raw);
    * `ok` = the payload decodes AND agrees with the declaration.
    */
  final case class PdfImage(objNum: Int, filter: String, declW: Int, declH: Int,
      width: Int, height: Int, channels: Int, ok: Boolean)

  private def channelsOf(dict: String): Int =
    if (dict.contains("/DeviceRGB")) 3
    else if (dict.contains("/DeviceCMYK")) 4
    else 1 // DeviceGray and anything undeclared

  def extract(bytes: Array[Byte]): Seq[PdfImage] = {
    if (!PdfTextExtractor.isPdf(bytes)) return Seq.empty
    val raw = PdfTextExtractor.rawStreams(bytes)
    val streams = PdfCrypt.decryptorFor(bytes) match {
      case Some(dec) => raw.map { case (n, g, dict, p) =>
        (n, g, dict, if (n >= 0) dec.decryptStream(n, math.max(g, 0), p) else p) }
      case None => raw
    }
    streams.collect {
      case (num, _, dict, payload)
          if dict.contains("/Subtype") && dict.contains("/Image") =>
        val declW = PdfTextExtractor.intParam(dict, "/Width").getOrElse(0)
        val declH = PdfTextExtractor.intParam(dict, "/Height").getOrElse(0)
        val bpc = PdfTextExtractor.intParam(dict, "/BitsPerComponent").getOrElse(8)
        val ch = channelsOf(dict)
        val filters = PdfTextExtractor.filterChain(dict)
        if (filters.contains("DCTDecode") || filters.contains("DCT")) {
          // memory-backed reader: ImageIO.read(InputStream) defaults to a
          // DISK-cached ImageInputStream — one tmp file + file I/O per
          // image, which across 32 decode threads dominates the walk
          // (measured ~10× on the q281 census); the payloads are small
          // in-memory byte arrays, so cache in memory
          val img =
            try Option(javax.imageio.ImageIO.read(
              new javax.imageio.stream.MemoryCacheImageInputStream(
                new ByteArrayInputStream(payload))))
            catch { case _: Exception => None }
          img match {
            case Some(i) =>
              val bands = i.getRaster.getNumBands
              PdfImage(num, "DCTDecode", declW, declH, i.getWidth, i.getHeight,
                bands, i.getWidth == declW && i.getHeight == declH)
            case None => PdfImage(num, "DCTDecode", declW, declH, 0, 0, 0, ok = false)
          }
        } else {
          val data = PdfTextExtractor.decodePayload(dict, payload)
          val want = declW.toLong * declH * ch * bpc / 8
          PdfImage(num, filters.headOption.getOrElse(""), declW, declH,
            declW, declH, ch, data.nonEmpty && data.length.toLong == want)
        }
    }
  }

  // ---------------------------------------------------------------------
  // fixture: a PDF embedding one REAL JPEG (deterministic RGB pattern
  // through ImageIO's encoder) and one raw Flate gray image, dims
  // closed-form in doc_id
  // ---------------------------------------------------------------------

  private[graft] def patternImage(id: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (id + 3L * x + 7L * y) % 256
        val g = (2L * id + 5L * x + y) % 256
        val b = (x * y + id) % 256
        img.setRGB(x, y, ((r.toInt << 16) | (g.toInt << 8) | b.toInt))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic fixture: JPEG image `16+id%16 × 8+id%8` (RGB) +
    * raw FlateDecode gray image `4+id%4 × 3+id%3`.
    */
  def synthImagePdf(id: Long): Array[Byte] = {
    def cc(s: String) = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val jw = 16 + (id % 16).toInt
    val jh = 8 + (id % 8).toInt
    val jbos = new ByteArrayOutputStream()
    // memory-backed writer (the OutputStream overload spools to a tmp FILE)
    val jios = new javax.imageio.stream.MemoryCacheImageOutputStream(jbos)
    javax.imageio.ImageIO.write(patternImage(id, jw, jh), "jpeg", jios)
    jios.close()
    val jpeg = jbos.toByteArray
    val rw = 4 + (id % 4).toInt
    val rh = 3 + (id % 3).toInt
    val gray = Array.tabulate(rw * rh)(i => ((id + 11L * i) % 256).toByte)
    val d = new java.util.zip.Deflater()
    d.setInput(gray); d.finish()
    val zbos = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) zbos.write(buf, 0, d.deflate(buf))
    d.end()
    val z = zbos.toByteArray
    val out = new ByteArrayOutputStream()
    out.write(cc("%PDF-1.4\n"))
    out.write(cc("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"))
    out.write(cc("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"))
    out.write(cc("3 0 obj << /Type /Page /Parent 2 0 R /Resources " +
      "<< /XObject << /Im1 4 0 R /Im2 5 0 R >> >> >> endobj\n"))
    out.write(cc(s"4 0 obj << /Subtype /Image /Width $jw /Height $jh " +
      s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode " +
      s"/Length ${jpeg.length} >>\nstream\n"))
    out.write(jpeg)
    out.write(cc("\nendstream\nendobj\n"))
    out.write(cc(s"5 0 obj << /Subtype /Image /Width $rw /Height $rh " +
      s"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode " +
      s"/Length ${z.length} >>\nstream\n"))
    out.write(z)
    out.write(cc("\nendstream\nendobj\n"))
    out.write(cc("%%EOF\n"))
    out.toByteArray
  }

  /** Per-doc image census over a synthesized corpus: one row per doc with
    * both images' geometry and decode flags (all closed-form in doc_id).
    */
  def imageCensus(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val inSchema = docs.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("n_images", LongType, nullable = false),
      StructField("dct_ok", IntegerType, nullable = false),
      StructField("dct_w", LongType, nullable = false),
      StructField("dct_h", LongType, nullable = false),
      StructField("dct_ch", LongType, nullable = false),
      StructField("raw_ok", IntegerType, nullable = false),
      StructField("raw_w", LongType, nullable = false),
      StructField("raw_h", LongType, nullable = false)))
    val idIdx = inSchema.fieldIndex(idCol)
    val rdd = docs.rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val imgs = extract(synthImagePdf(id))
        val dct = imgs.find(_.filter == "DCTDecode")
        val rawI = imgs.find(_.filter == "FlateDecode")
        Row.fromSeq(row.toSeq ++ Seq[Any](imgs.length.toLong,
          if (dct.exists(_.ok)) 1 else 0,
          dct.map(_.width.toLong).getOrElse(0L),
          dct.map(_.height.toLong).getOrElse(0L),
          dct.map(_.channels.toLong).getOrElse(0L),
          if (rawI.exists(_.ok)) 1 else 0,
          rawI.map(_.width.toLong).getOrElse(0L),
          rawI.map(_.height.toLong).getOrElse(0L)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
