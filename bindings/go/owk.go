// Package owk is a Go client for the open-whisper-kit-tpu HTTP server.
//
// Bindings story for non-Python languages (the reference wraps whisper.h
// into bindings/go; here the stable ABI is the HTTP server —
// server/http_server.py, the same pattern as whisper.cpp's own server
// clients). Mirrors bindings/c/owk_client.h one-to-one.
//
// Usage:
//
//	c := owk.New("127.0.0.1", 8080)
//	text, err := c.TranscribeFile("audio.wav", map[string]string{
//	        "language": "en", "response_format": "text"})
package owk

import (
	"bytes"
	"fmt"
	"io"
	"mime/multipart"
	"net/http"
	"net/url"
	"os"
	"strings"
	"time"
)

// Client talks to one owk-whisper-server instance.
type Client struct {
	BaseURL string
	HTTP    *http.Client
}

// New returns a client for host:port with a 300 s timeout (first request
// may pay a model compile).
func New(host string, port int) *Client {
	return &Client{
		BaseURL: fmt.Sprintf("http://%s:%d", host, port),
		HTTP:    &http.Client{Timeout: 300 * time.Second},
	}
}

// Health performs GET /health; nil means the server answered 200.
func (c *Client) Health() error {
	resp, err := c.HTTP.Get(c.BaseURL + "/health")
	if err != nil {
		return err
	}
	defer resp.Body.Close()
	if resp.StatusCode != http.StatusOK {
		return fmt.Errorf("health: status %d", resp.StatusCode)
	}
	return nil
}

// LoadModel performs POST /load to switch the served checkpoint.
func (c *Client) LoadModel(modelPath string) error {
	resp, err := c.HTTP.PostForm(c.BaseURL+"/load",
		url.Values{"model": {modelPath}})
	if err != nil {
		return err
	}
	defer resp.Body.Close()
	if resp.StatusCode != http.StatusOK {
		body, _ := io.ReadAll(resp.Body)
		return fmt.Errorf("load: status %d: %s", resp.StatusCode,
			strings.TrimSpace(string(body)))
	}
	return nil
}

// TranscribeFile POSTs the audio file to /inference with optional params
// (language, temperature, beam_size, response_format, ...) and returns the
// raw response body (text or JSON depending on response_format).
func (c *Client) TranscribeFile(audioPath string, params map[string]string) (string, error) {
	f, err := os.Open(audioPath)
	if err != nil {
		return "", err
	}
	defer f.Close()
	return c.Transcribe(f, audioPath, params)
}

// Transcribe streams an audio reader as the multipart "file" field.
func (c *Client) Transcribe(r io.Reader, name string, params map[string]string) (string, error) {
	var buf bytes.Buffer
	mw := multipart.NewWriter(&buf)
	fw, err := mw.CreateFormFile("file", name)
	if err != nil {
		return "", err
	}
	if _, err := io.Copy(fw, r); err != nil {
		return "", err
	}
	for k, v := range params {
		if err := mw.WriteField(k, v); err != nil {
			return "", err
		}
	}
	if err := mw.Close(); err != nil {
		return "", err
	}
	resp, err := c.HTTP.Post(c.BaseURL+"/inference",
		mw.FormDataContentType(), &buf)
	if err != nil {
		return "", err
	}
	defer resp.Body.Close()
	body, err := io.ReadAll(resp.Body)
	if err != nil {
		return "", err
	}
	if resp.StatusCode != http.StatusOK {
		return "", fmt.Errorf("inference: status %d: %s", resp.StatusCode,
			strings.TrimSpace(string(body)))
	}
	return string(body), nil
}

// postMultipart posts an audio file + params to `path`, returning the body.
func (c *Client) postMultipart(path, audioPath string, params map[string]string) (string, error) {
	f, err := os.Open(audioPath)
	if err != nil {
		return "", err
	}
	defer f.Close()
	var buf bytes.Buffer
	mw := multipart.NewWriter(&buf)
	fw, err := mw.CreateFormFile("file", audioPath)
	if err != nil {
		return "", err
	}
	if _, err := io.Copy(fw, f); err != nil {
		return "", err
	}
	for k, v := range params {
		if err := mw.WriteField(k, v); err != nil {
			return "", err
		}
	}
	if err := mw.Close(); err != nil {
		return "", err
	}
	resp, err := c.HTTP.Post(c.BaseURL+path, mw.FormDataContentType(), &buf)
	if err != nil {
		return "", err
	}
	defer resp.Body.Close()
	body, err := io.ReadAll(resp.Body)
	if err != nil {
		return "", err
	}
	if resp.StatusCode != http.StatusOK {
		return "", fmt.Errorf("%s: status %d: %s", path, resp.StatusCode,
			strings.TrimSpace(string(body)))
	}
	return string(body), nil
}

// TranscribeWords transcribes with response_format=verbose_json: the JSON
// carries per-word timestamps + probabilities ("words" arrays).
func (c *Client) TranscribeWords(audioPath string, params map[string]string) (string, error) {
	merged := map[string]string{"response_format": "verbose_json"}
	for k, v := range params {
		merged[k] = v
	}
	return c.postMultipart("/inference", audioPath, merged)
}

// DetectLanguage POSTs /detect-language; returns JSON with
// detected_language / probability / language_probabilities.
func (c *Client) DetectLanguage(audioPath string) (string, error) {
	return c.postMultipart("/detect-language", audioPath, nil)
}

// Diarize POSTs /diarize (requires --diarize-model on the server); params
// may set threshold / median_window / preset / response_format
// ("json"|"rttm") / file_id.
func (c *Client) Diarize(audioPath string, params map[string]string) (string, error) {
	return c.postMultipart("/diarize", audioPath, params)
}

// StreamSession is a live /stream/* transcription session.
type StreamSession struct {
	c  *Client
	ID string
}

func (c *Client) postRaw(path, ctype string, body []byte) (string, error) {
	resp, err := c.HTTP.Post(c.BaseURL+path, ctype, bytes.NewReader(body))
	if err != nil {
		return "", err
	}
	defer resp.Body.Close()
	out, err := io.ReadAll(resp.Body)
	if err != nil {
		return "", err
	}
	if resp.StatusCode != http.StatusOK {
		return "", fmt.Errorf("%s: status %d: %s", path, resp.StatusCode,
			strings.TrimSpace(string(out)))
	}
	return string(out), nil
}

// StreamStart opens a streaming session; paramsJSON may set step_ms /
// length_ms / keep_ms / language / translate / keep_context.
func (c *Client) StreamStart(paramsJSON string) (*StreamSession, error) {
	if paramsJSON == "" {
		paramsJSON = "{}"
	}
	body, err := c.postRaw("/stream/start", "application/json",
		[]byte(paramsJSON))
	if err != nil {
		return nil, err
	}
	// {"session": "sN"}
	i := strings.Index(body, `"session"`)
	if i < 0 {
		return nil, fmt.Errorf("stream start: no session in %q", body)
	}
	rest := body[i+len(`"session"`):]
	q0 := strings.Index(rest, `"`)
	q1 := strings.Index(rest[q0+1:], `"`)
	if q0 < 0 || q1 < 0 {
		return nil, fmt.Errorf("stream start: bad response %q", body)
	}
	return &StreamSession{c: c, ID: rest[q0+1 : q0+1+q1]}, nil
}

// Feed sends 16 kHz mono s16le PCM; returns the events JSON
// {"events": [{"text","t0","t1","final"}...]}.
func (s *StreamSession) Feed(pcmS16le []byte) (string, error) {
	return s.c.postRaw("/stream/feed?session="+url.QueryEscape(s.ID),
		"application/octet-stream", pcmS16le)
}

// Finish flushes remaining audio and closes the session; returns the
// final events JSON.
func (s *StreamSession) Finish(pcmS16le []byte) (string, error) {
	return s.c.postRaw("/stream/finish?session="+url.QueryEscape(s.ID),
		"application/octet-stream", pcmS16le)
}
