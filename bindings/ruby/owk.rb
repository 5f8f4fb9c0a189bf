# Ruby client for the open-whisper-kit-tpu HTTP server (stdlib-only).
#
# Bindings story for non-Python languages (the reference ships a bindings/ruby
# native extension over whisper.h; here the stable ABI is the HTTP server —
# server/http_server.py). Mirrors bindings/c/owk_client.h.
#
#   c = OWK::Client.new("127.0.0.1", 8080)
#   puts c.transcribe_file("audio.wav", "language" => "en",
#                          "response_format" => "text")

require "net/http"
require "uri"

module OWK
  class Error < StandardError; end

  class Client
    BOUNDARY = "owk-ruby-boundary"

    def initialize(host = "127.0.0.1", port = 8080, timeout: 300)
      @host = host
      @port = port
      @timeout = timeout
    end

    # GET /health -> true when the server answers 200.
    def health?
      res = http.get("/health")
      res.is_a?(Net::HTTPSuccess)
    end

    # POST /load to switch the served checkpoint.
    def load_model(model_path)
      res = http.post("/load", URI.encode_www_form("model" => model_path),
                      "Content-Type" => "application/x-www-form-urlencoded")
      raise Error, "load: #{res.code} #{res.body}" unless res.is_a?(Net::HTTPSuccess)
      true
    end

    # POST /inference with the audio file; params may include language,
    # temperature, beam_size, response_format, ... Returns the raw body
    # (text or JSON depending on response_format).
    def transcribe_file(audio_path, params = {})
      transcribe(File.binread(audio_path), File.basename(audio_path), params)
    end

    def transcribe(wav_bytes, filename, params = {})
      post_multipart("/inference", wav_bytes, filename, params)
    end

    # Transcribe with per-word timestamps: verbose_json carries "words"
    # arrays (start/end/probability per word).
    def transcribe_words(audio_path, params = {})
      transcribe_file(audio_path,
                      params.merge("response_format" => "verbose_json"))
    end

    # POST /detect-language -> JSON string with detected_language /
    # probability / language_probabilities.
    def detect_language(audio_path)
      post_multipart("/detect-language", File.binread(audio_path),
                     File.basename(audio_path), {})
    end

    # POST /diarize (server needs --diarize-model); params: threshold,
    # median_window, preset, response_format ("json"|"rttm"), file_id.
    def diarize(audio_path, params = {})
      post_multipart("/diarize", File.binread(audio_path),
                     File.basename(audio_path), params)
    end

    # Open a live /stream session; params: step_ms, length_ms, keep_ms,
    # language, translate, keep_context. Returns a Stream.
    def stream_start(params = {})
      require "json"
      res = http.post("/stream/start", JSON.generate(params),
                      "Content-Type" => "application/json")
      raise Error, "stream start: #{res.code} #{res.body}" unless res.is_a?(Net::HTTPSuccess)
      Stream.new(self, JSON.parse(res.body)["session"])
    end

    def stream_post(kind, session, pcm_s16le)
      res = http.post("/stream/#{kind}?session=#{session}",
                      pcm_s16le || "",
                      "Content-Type" => "application/octet-stream")
      raise Error, "stream #{kind}: #{res.code} #{res.body}" unless res.is_a?(Net::HTTPSuccess)
      require "json"
      JSON.parse(res.body)["events"]
    end

    private

    def post_multipart(path, wav_bytes, filename, params)
      body = +""
      body << part_header("file", filename)
      body << wav_bytes << "\r\n"
      params.each do |k, v|
        body << "--#{BOUNDARY}\r\n" \
                "Content-Disposition: form-data; name=\"#{k}\"\r\n\r\n#{v}\r\n"
      end
      body << "--#{BOUNDARY}--\r\n"
      res = http.post(path, body,
                      "Content-Type" => "multipart/form-data; boundary=#{BOUNDARY}")
      raise Error, "#{path}: #{res.code} #{res.body}" unless res.is_a?(Net::HTTPSuccess)
      res.body
    end

    def part_header(name, filename)
      "--#{BOUNDARY}\r\n" \
        "Content-Disposition: form-data; name=\"#{name}\"; filename=\"#{filename}\"\r\n" \
        "Content-Type: audio/wav\r\n\r\n"
    end

    def http
      h = Net::HTTP.new(@host, @port)
      h.read_timeout = @timeout
      h
    end
  end

  # One live transcription session over /stream/{feed,finish}
  # (the reference addon.node StreamingSession analog).
  class Stream
    def initialize(client, id)
      @client = client
      @id = id
    end

    attr_reader :id

    # Feed 16 kHz mono s16le PCM bytes; returns the incremental events
    # [{"text", "t0", "t1", "final", "speaker_turn_next"}...].
    def feed(pcm_s16le)
      @client.stream_post("feed", @id, pcm_s16le)
    end

    # Flush + close; returns the final events.
    def finish(pcm_s16le = nil)
      @client.stream_post("finish", @id, pcm_s16le)
    end
  end
end
