import java.awt.image.BufferedImage;
import java.awt.image.Raster;
import java.io.*;
import javax.imageio.ImageIO;

/** External-decoder harness for the JPEG validation tests: decode each
 *  argv JPEG with the JDK's ImageIO plugin (IJG-derived, independent of
 *  the repo's Python codec) and write raw raster samples to
 *  <path>.rgb plus "w h bands" to <path>.meta. Raster access (not
 *  getRGB) so no color management touches the values. */
public class DecodeJpegToRaw {
    public static void main(String[] args) throws Exception {
        for (String path : args) {
            BufferedImage dec = ImageIO.read(new File(path));
            Raster ra = dec.getRaster();
            int w = dec.getWidth(), h = dec.getHeight(), nc = ra.getNumBands();
            byte[] out = new byte[w * h * nc];
            int i = 0;
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++)
                    for (int c = 0; c < nc; c++)
                        out[i++] = (byte) ra.getSample(x, y, c);
            try (FileOutputStream f = new FileOutputStream(path + ".rgb")) { f.write(out); }
            try (PrintWriter f = new PrintWriter(path + ".meta")) { f.println(w + " " + h + " " + nc); }
        }
        System.out.println("OK " + args.length);
    }
}
