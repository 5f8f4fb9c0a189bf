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
      body = +""
      body << part_header("file", filename)
      body << wav_bytes << "\r\n"
      params.each do |k, v|
        body << "--#{BOUNDARY}\r\n" \
                "Content-Disposition: form-data; name=\"#{k}\"\r\n\r\n#{v}\r\n"
      end
      body << "--#{BOUNDARY}--\r\n"
      res = http.post("/inference", body,
                      "Content-Type" => "multipart/form-data; boundary=#{BOUNDARY}")
      raise Error, "inference: #{res.code} #{res.body}" unless res.is_a?(Net::HTTPSuccess)
      res.body
    end

    private

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
end
