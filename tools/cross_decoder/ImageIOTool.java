// Cross-decoder conformance helper (round 8): a tiny CLI over
// javax.imageio — the JDK's independent image codec stack (its JPEG
// reader/writer wraps libjpeg; PNG/GIF/BMP are independent pure-Java
// implementations).  Used ONCE by tools/gen_cross_decoder_golden.py to
// produce the committed fixtures under tests/golden/; the pytest suite
// only reads the fixtures and needs no JVM.
//
// Raw pixel interchange format ("RAWI"), little-endian-free by design:
//   ASCII header line:  RAWI <width> <height> <bands>\n
//   then width*height*bands bytes, row-major, band-interleaved
//   (bands=1 -> gray, bands=3 -> R,G,B).
//
// Usage:
//   java ImageIOTool decode <image-file> <out.rawi>
//   java ImageIOTool encode <format> <in.rawi> <out-image-file>
// format is an ImageIO informal name: jpg | png | gif | bmp.

import java.awt.image.BufferedImage;
import java.io.DataInputStream;
import java.io.File;
import java.io.FileInputStream;
import java.io.FileOutputStream;
import java.io.IOException;
import java.io.OutputStream;
import javax.imageio.ImageIO;

public final class ImageIOTool {

    public static void main(String[] args) throws IOException {
        if (args.length == 3 && args[0].equals("decode")) {
            decode(args[1], args[2]);
        } else if (args.length == 4 && args[0].equals("encode")) {
            encode(args[1], args[2], args[3]);
        } else {
            System.err.println("usage: decode <in> <out.rawi> | encode <fmt> <in.rawi> <out>");
            System.exit(2);
        }
    }

    private static void decode(String in, String out) throws IOException {
        BufferedImage im = ImageIO.read(new File(in));
        if (im == null) throw new IOException("ImageIO could not read " + in);
        int w = im.getWidth(), h = im.getHeight();
        boolean gray = im.getColorModel().getNumColorComponents() == 1;
        int bands = gray ? 1 : 3;
        try (OutputStream os = new FileOutputStream(out)) {
            os.write(("RAWI " + w + " " + h + " " + bands + "\n").getBytes("US-ASCII"));
            byte[] row = new byte[w * bands];
            for (int y = 0; y < h; y++) {
                for (int x = 0; x < w; x++) {
                    if (gray) {
                        // raster sample, not getRGB: avoids the gray->sRGB
                        // tone ramp ColorModel.getRGB would apply
                        row[x] = (byte) im.getRaster().getSample(x, y, 0);
                    } else {
                        int argb = im.getRGB(x, y);  // palette-safe for GIF
                        row[3 * x] = (byte) ((argb >> 16) & 0xFF);
                        row[3 * x + 1] = (byte) ((argb >> 8) & 0xFF);
                        row[3 * x + 2] = (byte) (argb & 0xFF);
                    }
                }
                os.write(row);
            }
        }
    }

    private static void encode(String fmt, String in, String out) throws IOException {
        int w, h, bands;
        byte[] px;
        try (DataInputStream is = new DataInputStream(new FileInputStream(in))) {
            StringBuilder hdr = new StringBuilder();
            int c;
            while ((c = is.read()) != -1 && c != '\n') hdr.append((char) c);
            String[] f = hdr.toString().trim().split("\\s+");
            if (f.length != 4 || !f[0].equals("RAWI")) throw new IOException("bad RAWI header");
            w = Integer.parseInt(f[1]);
            h = Integer.parseInt(f[2]);
            bands = Integer.parseInt(f[3]);
            px = new byte[w * h * bands];
            is.readFully(px);
        }
        BufferedImage im;
        if (bands == 1) {
            im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
            im.getRaster().setDataElements(0, 0, w, h, px);
        } else {
            im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int i = (y * w + x) * 3;
                    im.setRGB(x, y, ((px[i] & 0xFF) << 16)
                            | ((px[i + 1] & 0xFF) << 8) | (px[i + 2] & 0xFF));
                }
        }
        if (!ImageIO.write(im, fmt, new File(out)))
            throw new IOException("no ImageIO writer for " + fmt);
    }

    private ImageIOTool() {}
}
