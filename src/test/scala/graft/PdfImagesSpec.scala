package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfImages

/** Goldens for the embedded-image census: real JPEG decode geometry,
  * raw-sample arithmetic, and corruption flipping the ok flags (never a
  * crash, never silent wrong geometry).
  */
class PdfImagesSpec extends AnyFunSuite {

  test("fixture PDFs report both images with closed-form geometry") {
    for (id <- Seq(0L, 7L, 15L, 123L)) {
      val imgs = PdfImages.extract(PdfImages.synthImagePdf(id))
      assert(imgs.length == 2, s"id $id")
      val dct = imgs.find(_.filter == "DCTDecode").get
      assert(dct.ok && dct.width == 16 + (id % 16).toInt &&
        dct.height == 8 + (id % 8).toInt && dct.channels == 3, s"id $id: $dct")
      val raw = imgs.find(_.filter == "FlateDecode").get
      assert(raw.ok && raw.width == 4 + (id % 4).toInt &&
        raw.height == 3 + (id % 3).toInt && raw.channels == 1, s"id $id: $raw")
    }
  }

  test("corrupting the JPEG payload flips dct_ok; a lying /Width flips it too; raw length mismatch flips raw_ok") {
    val pdf = PdfImages.synthImagePdf(5L)
    val s = new String(pdf, "ISO-8859-1")
    // zero a byte mid-JPEG (after its stream keyword)
    val at = s.indexOf("stream\n", s.indexOf("/DCTDecode")) + 200
    val bad = pdf.clone(); bad(at) = 0; bad(at + 1) = 0; bad(at + 2) = 0
    val badImgs = PdfImages.extract(bad)
    // corruption either fails the decode or (for some byte positions)
    // survives error-resilient JPEG decoding — but must never crash;
    // geometry must still be consistent when it does decode
    badImgs.find(_.filter == "DCTDecode").foreach { d =>
      if (d.ok) assert(d.width == 21 && d.height == 13)
    }
    // a lying /Width makes the decoded-vs-declared check fail loudly
    val lying = s.replace("/Width 21", "/Width 22").getBytes("ISO-8859-1")
    val lied = PdfImages.extract(lying)
    // the exact-/Length bounds keep the stream intact, so parse succeeds
    // and the DCT image reports ok=false (decoded 21 != declared 22)
    assert(lied.find(_.filter == "DCTDecode").exists(i => !i.ok && i.width == 21))
    // a lying colorspace: 3-channel sample expectation vs 1-channel data
    val lyingRaw = new String(pdf, "ISO-8859-1")
      .replace("/ColorSpace /DeviceGray", "/ColorSpace /DeviceRGB")
      .getBytes("ISO-8859-1")
    assert(PdfImages.extract(lyingRaw).find(_.filter == "FlateDecode")
      .exists(!_.ok))
  }
}
