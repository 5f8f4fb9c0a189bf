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

        HttpRequest req = HttpRequest.newBuilder(URI.create(baseUrl + "/inference"))
                .header("Content-Type", "multipart/form-data; boundary=" + BOUNDARY)
                .timeout(Duration.ofSeconds(300))
                .POST(HttpRequest.BodyPublishers.ofByteArray(body.toByteArray()))
                .build();
        HttpResponse<String> res = http.send(req, HttpResponse.BodyHandlers.ofString());
        if (res.statusCode() != 200) {
            throw new IOException("inference: status " + res.statusCode()
                    + ": " + res.body());
        }
        return res.body();
    }

    private static void write(ByteArrayOutputStream out, String s) {
        out.writeBytes(s.getBytes(StandardCharsets.UTF_8));
    }
}
