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
// Audio interchange format ("RAWS"):
//   ASCII header line:  RAWS <rate> <channels> <frames>\n
//   then frames*channels little-endian int16 samples, interleaved.
//
// Usage:
//   java ImageIOTool decode <image-file> <out.rawi>
//   java ImageIOTool encode <format> <in.rawi> <out-image-file>
//   java ImageIOTool encode-wav <in.raws> <out.wav>
//   java ImageIOTool decode-wav <in.wav> <out.raws>
// format is an ImageIO informal name (jpg | png | gif | bmp) or png_i
// for Adam7-interlaced PNG (ImageWriteParam progressive mode).

import java.awt.image.BufferedImage;
import java.io.DataInputStream;
import java.io.File;
import java.io.FileInputStream;
import java.io.FileOutputStream;
import java.io.IOException;
import java.io.OutputStream;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;
import javax.sound.sampled.AudioFormat;
import javax.sound.sampled.AudioInputStream;
import javax.sound.sampled.AudioSystem;
import javax.sound.sampled.UnsupportedAudioFileException;

public final class ImageIOTool {

    public static void main(String[] args) throws Exception {
        if (args.length == 3 && args[0].equals("decode")) {
            decode(args[1], args[2]);
        } else if (args.length == 4 && args[0].equals("encode")) {
            encode(args[1], args[2], args[3]);
        } else if (args.length == 3 && args[0].equals("encode-wav")) {
            encodeWav(args[1], args[2]);
        } else if (args.length == 3 && args[0].equals("decode-wav")) {
            decodeWav(args[1], args[2]);
        } else {
            System.err.println("usage: decode <in> <out.rawi> | encode <fmt> <in.rawi> <out>"
                    + " | encode-wav <in.raws> <out.wav> | decode-wav <in.wav> <out.raws>");
            System.exit(2);
        }
    }

    private static void encodeWav(String in, String out) throws IOException {
        int rate, channels, frames;
        byte[] pcm;
        try (DataInputStream is = new DataInputStream(new FileInputStream(in))) {
            String[] f = readHeader(is);
            if (!f[0].equals("RAWS")) throw new IOException("bad RAWS header");
            rate = Integer.parseInt(f[1]);
            channels = Integer.parseInt(f[2]);
            frames = Integer.parseInt(f[3]);
            pcm = new byte[frames * channels * 2];
            is.readFully(pcm);
        }
        AudioFormat fmt = new AudioFormat(rate, 16, channels, true, false);
        try (AudioInputStream ais = new AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, frames)) {
            AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE,
                    new File(out));
        }
    }

    private static void decodeWav(String in, String out)
            throws IOException, UnsupportedAudioFileException {
        try (AudioInputStream ais = AudioSystem.getAudioInputStream(new File(in))) {
            AudioFormat fmt = ais.getFormat();
            if (fmt.getSampleSizeInBits() != 16 || fmt.isBigEndian())
                throw new IOException("expected 16-bit little-endian PCM");
            byte[] pcm = ais.readAllBytes();
            int frames = pcm.length / (2 * fmt.getChannels());
            try (OutputStream os = new FileOutputStream(out)) {
                os.write(("RAWS " + (int) fmt.getSampleRate() + " "
                        + fmt.getChannels() + " " + frames + "\n").getBytes("US-ASCII"));
                os.write(pcm);
            }
        }
    }

    private static String[] readHeader(DataInputStream is) throws IOException {
        StringBuilder hdr = new StringBuilder();
        int c;
        while ((c = is.read()) != -1 && c != '\n') hdr.append((char) c);
        return hdr.toString().trim().split("\\s+");
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
            String[] f = readHeader(is);
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
        if (fmt.equals("png_i") || fmt.equals("gif_i")) {
            // interlaced PNG (Adam7) / GIF (4-pass) via progressive mode
            String base = fmt.substring(0, 3);
            ImageWriter wr = ImageIO.getImageWritersByFormatName(base).next();
            ImageWriteParam p = wr.getDefaultWriteParam();
            p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
            try (ImageOutputStream ios = ImageIO.createImageOutputStream(new File(out))) {
                wr.setOutput(ios);
                wr.write(null, new IIOImage(im, null, null), p);
            }
            wr.dispose();
            return;
        }
        if (!ImageIO.write(im, fmt, new File(out)))
            throw new IOException("no ImageIO writer for " + fmt);
    }

    private ImageIOTool() {}
}
