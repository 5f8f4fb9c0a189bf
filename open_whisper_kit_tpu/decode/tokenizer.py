"""Whisper vocabulary + tokenizer.

Mirrors the reference vocab handling (src/whisper.cpp:429-458 special-token
defaults, :1625-1672 multilingual offset fixup and synthetic extra tokens,
:3262-3320 GPT-2-regex + longest-match tokenizer, :280-382 language table).
Token strings are raw bytes (the converter already applied the GPT-2 byte
decoder), so all matching happens on bytes.
"""

from __future__ import annotations

import dataclasses
import re

LANGUAGES: list[tuple[str, str]] = [
    ("en", "english"), ("zh", "chinese"), ("de", "german"), ("es", "spanish"),
    ("ru", "russian"), ("ko", "korean"), ("fr", "french"), ("ja", "japanese"),
    ("pt", "portuguese"), ("tr", "turkish"), ("pl", "polish"), ("ca", "catalan"),
    ("nl", "dutch"), ("ar", "arabic"), ("sv", "swedish"), ("it", "italian"),
    ("id", "indonesian"), ("hi", "hindi"), ("fi", "finnish"), ("vi", "vietnamese"),
    ("he", "hebrew"), ("uk", "ukrainian"), ("el", "greek"), ("ms", "malay"),
    ("cs", "czech"), ("ro", "romanian"), ("da", "danish"), ("hu", "hungarian"),
    ("ta", "tamil"), ("no", "norwegian"), ("th", "thai"), ("ur", "urdu"),
    ("hr", "croatian"), ("bg", "bulgarian"), ("lt", "lithuanian"), ("la", "latin"),
    ("mi", "maori"), ("ml", "malayalam"), ("cy", "welsh"), ("sk", "slovak"),
    ("te", "telugu"), ("fa", "persian"), ("lv", "latvian"), ("bn", "bengali"),
    ("sr", "serbian"), ("az", "azerbaijani"), ("sl", "slovenian"), ("kn", "kannada"),
    ("et", "estonian"), ("mk", "macedonian"), ("br", "breton"), ("eu", "basque"),
    ("is", "icelandic"), ("hy", "armenian"), ("ne", "nepali"), ("mn", "mongolian"),
    ("bs", "bosnian"), ("kk", "kazakh"), ("sq", "albanian"), ("sw", "swahili"),
    ("gl", "galician"), ("mr", "marathi"), ("pa", "punjabi"), ("si", "sinhala"),
    ("km", "khmer"), ("sn", "shona"), ("yo", "yoruba"), ("so", "somali"),
    ("af", "afrikaans"), ("oc", "occitan"), ("ka", "georgian"), ("be", "belarusian"),
    ("tg", "tajik"), ("sd", "sindhi"), ("gu", "gujarati"), ("am", "amharic"),
    ("yi", "yiddish"), ("lo", "lao"), ("uz", "uzbek"), ("fo", "faroese"),
    ("ht", "haitian creole"), ("ps", "pashto"), ("tk", "turkmen"), ("nn", "nynorsk"),
    ("mt", "maltese"), ("sa", "sanskrit"), ("lb", "luxembourgish"), ("my", "myanmar"),
    ("bo", "tibetan"), ("tl", "tagalog"), ("mg", "malagasy"), ("as", "assamese"),
    ("tt", "tatar"), ("haw", "hawaiian"), ("ln", "lingala"), ("ha", "hausa"),
    ("ba", "bashkir"), ("jw", "javanese"), ("su", "sundanese"), ("yue", "cantonese"),
]

LANG_TO_ID = {code: i for i, (code, _) in enumerate(LANGUAGES)}
LANG_NAME_TO_ID = {name: i for i, (_, name) in enumerate(LANGUAGES)}

# non-speech token surface strings (src/whisper.cpp:6130-6135)
NON_SPEECH_TOKENS = [
    "\"", "#", "(", ")", "*", "+", "/", ":", ";", "<", "=", ">", "@", "[",
    "\\", "]", "^", "_", "`", "{", "|", "}", "~", "「", "」", "『", "』",
    "<<", ">>", "<<<", ">>>", "--", "---", "-(", "-[", "('", "(\"", "((",
    "))", "(((", ")))", "[[", "]]", "{{", "}}", "♪♪", "♪♪♪", "♩", "♪",
    "♫", "♬", "♭", "♮", "♯",
]

# GPT-2 pre-tokenizer split, C++ std::regex flavor (ASCII classes) as used by
# the reference (src/whisper.cpp:3270-3279); operates on bytes.
_SPLIT_RE = re.compile(
    rb"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


@dataclasses.dataclass
class WhisperVocab:
    n_vocab: int
    id_to_token: list[bytes]          # length n_vocab (padded with synthetics)
    token_to_id: dict[bytes, int]
    token_eot: int
    token_sot: int
    token_translate: int
    token_transcribe: int
    token_solm: int
    token_prev: int
    token_nosp: int
    token_not: int
    token_beg: int

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.n_vocab - 51765 - (1 if self.is_multilingual else 0)

    def token_lang(self, lang_id: int) -> int:
        return self.token_sot + 1 + lang_id

    def token_to_str(self, tid: int) -> str:
        return self.id_to_token[tid].decode("utf-8", errors="replace")

    def decode(self, ids, skip_special: bool = True) -> str:
        out = b""
        for t in ids:
            if skip_special and t >= self.token_eot:
                continue
            out += self.id_to_token[t]
        return out.decode("utf-8", errors="replace")

    def tokenize(self, text: str) -> list[int]:
        """Greedy longest-match encoding (src/whisper.cpp:3272-3320)."""
        data = text.encode("utf-8")
        ids: list[int] = []
        for word in _SPLIT_RE.findall(data):
            i, n = 0, len(word)
            while i < n:
                j = n
                found = False
                while j > i:
                    tid = self.token_to_id.get(word[i:j])
                    if tid is not None:
                        ids.append(tid)
                        i = j
                        found = True
                        break
                    j -= 1
                if not found:
                    i += 1  # unknown byte: skip (reference logs an error)
        return ids


def build_vocab(tokens: list[bytes], n_vocab: int) -> WhisperVocab:
    """From the checkpoint token list; applies the multilingual id fixup and
    synthesizes names for ids beyond the stored vocab
    (src/whisper.cpp:1625-1672)."""
    eot, sot = 50256, 50257
    translate, transcribe = 50357, 50358
    solm, prev, nosp, not_, beg = 50359, 50360, 50361, 50362, 50363

    multilingual = n_vocab >= 51865
    num_languages = n_vocab - 51765 - (1 if multilingual else 0)
    if multilingual:
        eot += 1
        sot += 1
        dt = num_languages - 98
        translate += dt
        transcribe += dt
        solm += dt
        prev += dt
        nosp += dt
        not_ += dt
        beg += dt

    id_to_token = list(tokens)
    token_to_id = {t: i for i, t in enumerate(tokens)}

    for i in range(len(tokens), n_vocab):
        if i > beg:
            word = f"[_TT_{i - beg}]"
        elif i == eot:
            word = "[_EOT_]"
        elif i == sot:
            word = "[_SOT_]"
        elif i == translate:
            word = "[_TRANSLATE_]"
        elif i == transcribe:
            word = "[_TRANSCRIBE_]"
        elif i == solm:
            word = "[_SOLM_]"
        elif i == prev:
            word = "[_PREV_]"
        elif i == nosp:
            word = "[_NOSP_]"
        elif i == not_:
            word = "[_NOT_]"
        elif i == beg:
            word = "[_BEG_]"
        elif sot < i <= sot + num_languages:
            word = f"[_LANG_{LANGUAGES[i - sot - 1][0]}]"
        else:
            word = f"[_extra_token_{i}]"
        b = word.encode("utf-8")
        id_to_token.append(b)
        token_to_id.setdefault(b, i)

    return WhisperVocab(
        n_vocab=n_vocab, id_to_token=id_to_token, token_to_id=token_to_id,
        token_eot=eot, token_sot=sot, token_translate=translate,
        token_transcribe=transcribe, token_solm=solm, token_prev=prev,
        token_nosp=nosp, token_not=not_, token_beg=beg,
    )


def lang_id(lang: str) -> int:
    """Language string (code or full name) -> id; -1 if unknown."""
    if lang in LANG_TO_ID:
        return LANG_TO_ID[lang]
    return LANG_NAME_TO_ID.get(lang, -1)


def lang_str(lid: int) -> str:
    return LANGUAGES[lid][0] if 0 <= lid < len(LANGUAGES) else "??"
