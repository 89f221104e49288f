package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[JpegDecoder]] two independent ways: exact integer expectations on
  * handcrafted DC-only streams (every value derivable by hand from T.81),
  * and tolerance-based cross-validation against the JDK's own ImageIO JPEG
  * codec on round-tripped images (IDCT implementations may legally differ
  * by a couple of ulps per sample; ±3 absorbs that plus chroma rounding). */
class JpegDecoderSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Grayscale baseline JPEG, w×h in {8×8, 16×8}, DC-only: custom tables
    * give DC cat0 code `00`, cat6 code `01`, AC EOB `000000`, so the
    * entropy stream for value v (32 ≤ v ≤ 63, so EXTEND is the identity)
    * is 0x40|v then EOB(s); with q0 = 8 the flat decoded plane is exactly
    * 128 + v. Mirrors x101's SQL-built fixture byte for byte. */
  private def dcOnlyGray(v: Int, twoMcus: Boolean): Array[Byte] = {
    require(v >= 32 && v <= 63)
    val w = if (twoMcus) "0010" else "0008"
    val entropy =
      if (twoMcus) f"${0x40 | v}%02x0003" // [01 v6][EOB][DC2=00][EOB][pad 11]
      else f"${0x40 | v}%02x03"           // [01 v6][EOB][pad 11]
    hex(
      "ffd8" +
        "ffdb004300" + "08" + "01" * 63 + // DQT: q0=8, rest 1
        "ffc0000b08" + "0008" + w + "01" + "011100" + // SOF0 gray 1x1
        "ffc4001500" + "0002" + "00" * 14 + "0006" + // DHT DC: len-2 syms 00,06
        "ffc4001410" + "000000000001" + "00" * 10 + "00" + // DHT AC: len-6 sym 00 (EOB)
        "ffda000801" + "0100" + "003f00" + // SOS
        entropy +
        "ffd9")
  }

  test("handcrafted DC-only 8x8: flat plane of exactly 128+v") {
    for (v <- Seq(32, 45, 63)) {
      val dec = JpegDecoder.decode(dcOnlyGray(v, twoMcus = false))
        .getOrElse(fail(s"decode failed for v=$v"))
      assert(dec.width == 8 && dec.height == 8 && dec.nComp == 1)
      assert(dec.pixels.length == 64)
      assert(dec.pixels.forall(b => (b & 0xff) == 128 + v), s"v=$v")
    }
  }

  test("handcrafted DC-only 16x8 (two MCUs): DC prediction carries to the second block") {
    val dec = JpegDecoder.decode(dcOnlyGray(40, twoMcus = true))
      .getOrElse(fail("decode failed"))
    assert(dec.width == 16 && dec.height == 8 && dec.nComp == 1)
    assert(dec.pixels.length == 128)
    assert(dec.pixels.forall(b => (b & 0xff) == 168))
  }

  test("restart interval: RST0 between MCUs byte-aligns and resets the DC predictor") {
    // 16x8, DRI=1: each MCU re-encodes the full DC value (predictor reset),
    // entropy = [01 v6][EOB][pad] FFD0 [01 v6][EOB][pad]
    val v = 50
    val jpeg = hex(
      "ffd8" +
        "ffdb004300" + "08" + "01" * 63 +
        "ffdd00040001" + // DRI: restart every 1 MCU
        "ffc0000b08" + "0008" + "0010" + "01" + "011100" +
        "ffc4001500" + "0002" + "00" * 14 + "0006" +
        "ffc4001410" + "000000000001" + "00" * 10 + "00" +
        "ffda000801" + "0100" + "003f00" +
        f"${0x40 | v}%02x03" + "ffd0" + f"${0x40 | v}%02x03" +
        "ffd9")
    val dec = JpegDecoder.decode(jpeg).getOrElse(fail("decode failed"))
    assert(dec.width == 16 && dec.height == 8 && dec.nComp == 1)
    assert(dec.pixels.forall(b => (b & 0xff) == 128 + v))
  }

  test("corrupt and out-of-scope inputs return None, never throw") {
    assert(JpegDecoder.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegDecoder.decode(hex("ffd8ffd9")).isEmpty)
    val truncated = dcOnlyGray(40, twoMcus = false).dropRight(3)
    assert(JpegDecoder.decode(truncated).isEmpty)
    // progressive SOF2 is declared out of scope
    val prog = dcOnlyGray(40, twoMcus = false)
    val i = indexOfMarker(prog, 0xc0)
    prog(i + 1) = 0xc2.toByte
    assert(JpegDecoder.decode(prog).isEmpty)
  }

  private def indexOfMarker(d: Array[Byte], m: Int): Int =
    (0 until d.length - 1).find(i => (d(i) & 0xff) == 0xff && (d(i + 1) & 0xff) == m).get

  private def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("cross-validation: ImageIO-encoded grayscale decodes within ±3 of ImageIO's own decode") {
    for ((w, h) <- Seq((8, 8), (24, 16), (37, 13))) { // incl. non-multiple-of-8 crops
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 255 / math.max(1, w - 1) + y * 31) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val jpeg = encodeJpeg(img, 0.95f)
      val mine = JpegDecoder.decode(jpeg).getOrElse(fail(s"decode failed ${w}x$h"))
      assert(mine.width == w && mine.height == h && mine.nComp == 1)
      val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val r = ref.getRaster.getSample(x, y, 0)
        val m = mine.pixels(y * w + x) & 0xff
        maxDiff = math.max(maxDiff, math.abs(r - m))
      }
      assert(maxDiff <= 3, s"${w}x$h: max per-pixel diff $maxDiff")
    }
  }

  test("property: random grayscale content/dims/quality round-trips within tolerance of the JDK decoder") {
    // deterministic pseudo-random sweep (PropertySpec's fixed-seed
    // discipline): varied dimensions force every crop/MCU-edge path, varied
    // quality varies the quant tables and Huffman stream density
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 10) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val quality = 0.85f + rnd.nextFloat() * 0.14f
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val g = rnd.nextInt(256)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val jpeg = encodeJpeg(img, quality)
      val mine = JpegDecoder.decode(jpeg)
        .getOrElse(fail(s"trial $trial: decode failed ${w}x$h q=$quality"))
      assert(mine.width == w && mine.height == h && mine.nComp == 1)
      val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
      for (y <- 0 until h; x <- 0 until w) {
        val r = ref.getRaster.getSample(x, y, 0)
        val m = mine.pixels(y * w + x) & 0xff
        assert(math.abs(r - m) <= 3,
          s"trial $trial ${w}x$h q=$quality at ($x,$y): ref=$r mine=$m")
      }
    }
  }

  test("cross-validation: ImageIO-encoded RGB (subsampled chroma) stays within tolerance on luma structure") {
    // The JDK writer subsamples chroma (4:2:0) and its reader interpolates
    // chroma on upsample while this decoder replicates — compare the GREEN
    // channel (closest to luma) with a wider tolerance, plus exactness of
    // dimensions and component count.
    val (w, h) = (32, 24)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = x * 255 / (w - 1); val g = y * 255 / (h - 1); val b = 96
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val jpeg = encodeJpeg(img, 0.97f)
    val mine = JpegDecoder.decode(jpeg).getOrElse(fail("decode failed"))
    assert(mine.width == w && mine.height == h && mine.nComp == 3)
    val ref = ImageIO.read(new ByteArrayInputStream(jpeg))
    var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rg = (ref.getRGB(x, y) >> 8) & 0xff
      val mg = mine.pixels((y * w + x) * 3 + 1) & 0xff
      sumDiff += math.abs(rg - mg)
    }
    val meanDiff = sumDiff.toDouble / (w * h)
    assert(meanDiff <= 4.0, s"mean green-channel diff $meanDiff")
  }
}
