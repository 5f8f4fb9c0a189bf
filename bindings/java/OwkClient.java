/*
 * Java client for the open-whisper-kit-tpu HTTP server (JDK 11+, no deps).
 *
 * Bindings story for non-Python languages (the reference ships a
 * bindings/java JNA wrapper over whisper.h; here the stable ABI is the
 * HTTP server — server/http_server.py). Mirrors bindings/c/owk_client.h.
 *
 *   OwkClient c = new OwkClient("127.0.0.1", 8080);
 *   String text = c.transcribeFile(Path.of("audio.wav"),
 *           Map.of("language", "en", "response_format", "text"));
 */

import java.io.ByteArrayOutputStream;
import java.io.IOException;
import java.net.URI;
import java.net.URLEncoder;
import java.net.http.HttpClient;
import java.net.http.HttpRequest;
import java.net.http.HttpResponse;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Path;
import java.time.Duration;
import java.util.Map;

public class OwkClient {
    private static final String BOUNDARY = "owk-java-boundary";

    private final String baseUrl;
    private final HttpClient http;

    public OwkClient(String host, int port) {
        this.baseUrl = "http://" + host + ":" + port;
        this.http = HttpClient.newBuilder()
                .connectTimeout(Duration.ofSeconds(10)).build();
    }

    /** GET /health — true when the server answers 200. */
    public boolean health() throws IOException, InterruptedException {
        HttpRequest req = HttpRequest.newBuilder(URI.create(baseUrl + "/health"))
                .GET().build();
        return http.send(req, HttpResponse.BodyHandlers.discarding())
                .statusCode() == 200;
    }

    /** POST /load — switch the served checkpoint. */
    public void loadModel(String modelPath) throws IOException, InterruptedException {
        String form = "model=" + URLEncoder.encode(modelPath, StandardCharsets.UTF_8);
        HttpRequest req = HttpRequest.newBuilder(URI.create(baseUrl + "/load"))
                .header("Content-Type", "application/x-www-form-urlencoded")
                .POST(HttpRequest.BodyPublishers.ofString(form)).build();
        HttpResponse<String> res = http.send(req, HttpResponse.BodyHandlers.ofString());
        if (res.statusCode() != 200) {
            throw new IOException("load: status " + res.statusCode() + ": " + res.body());
        }
    }

    /**
     * POST /inference with a wav file and optional params (language,
     * temperature, beam_size, response_format, ...). Returns the raw body.
     */
    public String transcribeFile(Path audioPath, Map<String, String> params)
            throws IOException, InterruptedException {
        return transcribe(Files.readAllBytes(audioPath),
                audioPath.getFileName().toString(), params);
    }

    public String transcribe(byte[] wavBytes, String filename,
                             Map<String, String> params)
            throws IOException, InterruptedException {
        return postMultipart("/inference", wavBytes, filename, params);
    }

    /**
     * Transcribe with per-word timestamps: response_format=verbose_json —
     * the returned JSON carries "words" arrays (start/end/probability).
     */
    public String transcribeWords(Path audioPath, Map<String, String> params)
            throws IOException, InterruptedException {
        java.util.HashMap<String, String> merged = new java.util.HashMap<>(params);
        merged.put("response_format", "verbose_json");
        return transcribeFile(audioPath, merged);
    }

    /** POST /detect-language — JSON with detected_language / probability. */
    public String detectLanguage(Path audioPath)
            throws IOException, InterruptedException {
        return postMultipart("/detect-language", Files.readAllBytes(audioPath),
                audioPath.getFileName().toString(), Map.of());
    }

    /**
     * POST /diarize (server needs --diarize-model); params may set
     * threshold / median_window / preset / response_format ("json"|"rttm")
     * / file_id.
     */
    public String diarize(Path audioPath, Map<String, String> params)
            throws IOException, InterruptedException {
        return postMultipart("/diarize", Files.readAllBytes(audioPath),
                audioPath.getFileName().toString(), params);
    }

    /**
     * Open a live /stream session (the reference addon.node
     * StreamingSession analog); paramsJson may set step_ms / length_ms /
     * keep_ms / language / translate / keep_context.
     */
    public Stream streamStart(String paramsJson)
            throws IOException, InterruptedException {
        String body = postRaw("/stream/start", "application/json",
                (paramsJson == null ? "{}" : paramsJson)
                        .getBytes(StandardCharsets.UTF_8));
        int i = body.indexOf("\"session\"");
        if (i < 0) throw new IOException("stream start: " + body);
        int q0 = body.indexOf('"', i + 9);
        int q1 = body.indexOf('"', q0 + 1);
        return new Stream(this, body.substring(q0 + 1, q1));
    }

    /** One live transcription session over /stream/{feed,finish}. */
    public static final class Stream {
        private final OwkClient client;
        public final String id;

        private Stream(OwkClient client, String id) {
            this.client = client;
            this.id = id;
        }

        /** Feed 16 kHz mono s16le PCM; returns the events JSON. */
        public String feed(byte[] pcmS16le)
                throws IOException, InterruptedException {
            return client.postRaw("/stream/feed?session="
                    + URLEncoder.encode(id, StandardCharsets.UTF_8),
                    "application/octet-stream", pcmS16le);
        }

        /** Flush + close; returns the final events JSON. */
        public String finish(byte[] pcmS16le)
                throws IOException, InterruptedException {
            return client.postRaw("/stream/finish?session="
                    + URLEncoder.encode(id, StandardCharsets.UTF_8),
                    "application/octet-stream",
                    pcmS16le == null ? new byte[0] : pcmS16le);
        }
    }

    private String postMultipart(String path, byte[] wavBytes, String filename,
                                 Map<String, String> params)
            throws IOException, InterruptedException {
        ByteArrayOutputStream body = new ByteArrayOutputStream();
        write(body, "--" + BOUNDARY + "\r\n"
                + "Content-Disposition: form-data; name=\"file\"; filename=\""
                + filename + "\"\r\nContent-Type: audio/wav\r\n\r\n");
        body.writeBytes(wavBytes);
        write(body, "\r\n");
        for (Map.Entry<String, String> e : params.entrySet()) {
            write(body, "--" + BOUNDARY + "\r\n"
                    + "Content-Disposition: form-data; name=\"" + e.getKey()
                    + "\"\r\n\r\n" + e.getValue() + "\r\n");
        }
        write(body, "--" + BOUNDARY + "--\r\n");

        HttpRequest req = HttpRequest.newBuilder(URI.create(baseUrl + path))
                .header("Content-Type", "multipart/form-data; boundary=" + BOUNDARY)
                .timeout(Duration.ofSeconds(300))
                .POST(HttpRequest.BodyPublishers.ofByteArray(body.toByteArray()))
                .build();
        HttpResponse<String> res = http.send(req, HttpResponse.BodyHandlers.ofString());
        if (res.statusCode() != 200) {
            throw new IOException(path + ": status " + res.statusCode()
                    + ": " + res.body());
        }
        return res.body();
    }

    private String postRaw(String path, String contentType, byte[] body)
            throws IOException, InterruptedException {
        HttpRequest req = HttpRequest.newBuilder(URI.create(baseUrl + path))
                .header("Content-Type", contentType)
                .timeout(Duration.ofSeconds(300))
                .POST(HttpRequest.BodyPublishers.ofByteArray(body))
                .build();
        HttpResponse<String> res = http.send(req, HttpResponse.BodyHandlers.ofString());
        if (res.statusCode() != 200) {
            throw new IOException(path + ": status " + res.statusCode()
                    + ": " + res.body());
        }
        return res.body();
    }

    private static void write(ByteArrayOutputStream out, String s) {
        out.writeBytes(s.getBytes(StandardCharsets.UTF_8));
    }
}
