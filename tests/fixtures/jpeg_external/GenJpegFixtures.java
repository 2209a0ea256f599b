import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.*;
import javax.imageio.*;
import javax.imageio.stream.*;

/** Deterministic JPEG fixture generator using the JDK's ImageIO JPEG
 *  plugin (IJG-derived, independent of the repo's Python codec).
 *  Content is SMOOTH (integer ramps) so the T.81 decoder freedoms
 *  (IDCT precision, chroma upsampling filter) stay small; gray
 *  fixtures have no chroma at all. For each case writes name.jpg +
 *  name.rgb (raw interleaved samples of ImageIO's OWN decode, read
 *  straight from the raster to dodge color-management) + name.meta. */
public class GenJpegFixtures {
    public static void main(String[] args) throws Exception {
        File dir = new File(args[0]);
        dir.mkdirs();
        String[][] cases = {
            {"base_q75_rgb_64x48", "64", "48", "0", "75", "0"},
            {"base_q90_rgb_13x7", "13", "7", "0", "90", "0"},
            {"base_q50_rgb_17x23", "17", "23", "0", "50", "0"},
            {"base_q75_gray_32x32", "32", "32", "1", "75", "0"},
            {"base_q90_gray_41x29", "41", "29", "1", "90", "0"},
            {"prog_q75_rgb_64x48", "64", "48", "0", "75", "1"},
            {"prog_q90_rgb_31x19", "31", "19", "0", "90", "1"},
            {"prog_q75_gray_24x17", "24", "17", "1", "75", "1"},
            {"prog_q90_gray_40x32", "40", "32", "1", "90", "1"},
        };
        for (String[] c : cases) gen(dir, c[0], Integer.parseInt(c[1]),
            Integer.parseInt(c[2]), c[3].equals("1"),
            Integer.parseInt(c[4]) / 100f, c[5].equals("1"));
        System.out.println("OK");
    }
    static int ramp(int v, int n) { return n <= 1 ? 128 : (v * 255) / (n - 1); }
    static void gen(File dir, String name, int w, int h, boolean gray,
                    float q, boolean prog) throws Exception {
        BufferedImage img = new BufferedImage(w, h, gray
            ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_3BYTE_BGR);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = ramp(x, w), g = ramp(y, h), b = ramp(x + y, w + h - 1);
                if (gray) {
                    // write the luma value straight into the raster:
                    // TYPE_BYTE_GRAY is a LINEAR color space, setRGB
                    // would gamma-convert
                    img.getRaster().setSample(x, y, 0, (r + g) / 2);
                } else {
                    img.setRGB(x, y, (r << 16) | (g << 8) | b);
                }
            }
        ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(q);
        if (prog) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        ByteArrayOutputStream bos = new ByteArrayOutputStream();
        ImageOutputStream ios = ImageIO.createImageOutputStream(bos);
        wr.setOutput(ios);
        wr.write(null, new IIOImage(img, null, null), p);
        ios.close(); wr.dispose();
        byte[] jpeg = bos.toByteArray();
        try (FileOutputStream f = new FileOutputStream(new File(dir, name + ".jpg"))) { f.write(jpeg); }
        BufferedImage dec = ImageIO.read(new ByteArrayInputStream(jpeg));
        Raster ra = dec.getRaster();
        int dw = dec.getWidth(), dh = dec.getHeight();
        int nc = ra.getNumBands();
        byte[] out = new byte[dw * dh * nc];
        int i = 0;
        for (int y = 0; y < dh; y++)
            for (int x = 0; x < dw; x++)
                for (int c = 0; c < nc; c++)
                    out[i++] = (byte) ra.getSample(x, y, c);
        try (FileOutputStream f = new FileOutputStream(new File(dir, name + ".rgb"))) { f.write(out); }
        try (PrintWriter f = new PrintWriter(new File(dir, name + ".meta"))) {
            f.println(dw + " " + dh + " " + nc + " " + (gray ? "gray" : "rgb") + " " + (prog ? "prog" : "base"));
        }
        System.out.println(name + ": " + jpeg.length + " bytes, bands=" + nc);
    }
}
