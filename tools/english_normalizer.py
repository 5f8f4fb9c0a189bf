"""Faithful OpenAI EnglishTextNormalizer for the WER harness.

The reference harness (/root/reference/tests/librispeech/eval.py:30-46) runs
`whisper.normalizers.EnglishTextNormalizer` before jiwer — WER numbers are
only comparable to the reference's if the identical normalization runs.

Resolution order:
  1. `whisper.normalizers.EnglishTextNormalizer` if openai-whisper is
     installed (bit-exact incl. its full english.json spelling table);
  2. transformers' line-faithful port
     (transformers.models.whisper.english_normalizer, bundled in this
     image), which implements the same pipeline — bracket/parens removal,
     title/contraction expansion, EnglishNumberNormalizer (spoken numbers,
     currency, percent), punctuation stripping, spelling normalization —
     but takes the British→American spelling table as an argument. We
     supply the table from (a) the OWK_ENGLISH_SPELLING_JSON env var /
     explicit path (OpenAI's english.json, if the user has it), else
     (b) the common-word fallback below. Only rare British spellings
     outside the fallback can differ from the reference harness then.

Use `build_normalizer()` / `normalize_english(text)`.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

# Common British→American spellings (subset of OpenAI's english.json,
# covering the high-frequency cases in speech corpora).
FALLBACK_SPELLING = {
    "accessorise": "accessorize", "acknowledgement": "acknowledgment",
    "aeroplane": "airplane", "ageing": "aging", "aluminium": "aluminum",
    "amortise": "amortize", "analogue": "analog", "analyse": "analyze",
    "apologise": "apologize", "arbour": "arbor", "ardour": "ardor",
    "armour": "armor", "authorise": "authorize", "behaviour": "behavior",
    "behavioural": "behavioral", "calibre": "caliber", "cancelled": "canceled",
    "capitalise": "capitalize", "catalogue": "catalog", "categorise": "categorize",
    "centimetre": "centimeter", "centre": "center", "characterise": "characterize",
    "cheque": "check", "civilisation": "civilization", "civilise": "civilize",
    "colour": "color", "colourful": "colorful", "counselling": "counseling",
    "criticise": "criticize", "customise": "customize", "defence": "defense",
    "dialogue": "dialog", "digitise": "digitize", "draught": "draft",
    "emphasise": "emphasize", "endeavour": "endeavor", "favour": "favor",
    "favourable": "favorable", "favourite": "favorite", "fibre": "fiber",
    "flavour": "flavor", "fulfil": "fulfill", "generalise": "generalize",
    "glamour": "glamor", "grey": "gray", "harbour": "harbor",
    "honour": "honor", "honourable": "honorable", "humour": "humor",
    "jewellery": "jewelry", "judgement": "judgment", "kilometre": "kilometer",
    "labelled": "labeled", "labour": "labor", "licence": "license",
    "litre": "liter", "localise": "localize", "manoeuvre": "maneuver",
    "marvellous": "marvelous", "maximise": "maximize", "memorise": "memorize",
    "metre": "meter", "millimetre": "millimeter", "minimise": "minimize",
    "mobilise": "mobilize", "modelling": "modeling", "modernise": "modernize",
    "mould": "mold", "neighbour": "neighbor", "neighbourhood": "neighborhood",
    "normalise": "normalize", "odour": "odor", "offence": "offense",
    "optimise": "optimize", "organisation": "organization",
    "organise": "organize", "oxidise": "oxidize", "paralyse": "paralyze",
    "parlour": "parlor", "plough": "plow", "practise": "practice",
    "prioritise": "prioritize", "programme": "program", "publicise": "publicize",
    "realise": "realize", "recognise": "recognize", "rumour": "rumor",
    "sabre": "saber", "saviour": "savior", "savour": "savor",
    "signalling": "signaling", "specialise": "specialize",
    "splendour": "splendor", "stabilise": "stabilize",
    "standardise": "standardize", "subsidise": "subsidize",
    "summarise": "summarize", "symbolise": "symbolize",
    "sympathise": "sympathize", "theatre": "theater", "travelled": "traveled",
    "travelling": "traveling", "tumour": "tumor", "tyre": "tire",
    "utilise": "utilize", "valour": "valor", "vapour": "vapor",
    "vigour": "vigor", "whisky": "whiskey",
}


def _load_spelling(path: str | Path | None = None) -> dict:
    path = path or os.environ.get("OWK_ENGLISH_SPELLING_JSON")
    if path and Path(path).exists():
        return json.loads(Path(path).read_text())
    return dict(FALLBACK_SPELLING)


def build_normalizer(spelling_json: str | Path | None = None):
    """-> callable(str) -> str, the reference harness's normalization."""
    try:
        from whisper.normalizers import EnglishTextNormalizer  # exact
        return EnglishTextNormalizer()
    except ImportError:
        pass
    from transformers.models.whisper.english_normalizer import (
        EnglishTextNormalizer)
    return EnglishTextNormalizer(_load_spelling(spelling_json))


_default = None


def normalize_english(text: str) -> str:
    global _default
    if _default is None:
        _default = build_normalizer()
    return _default(text)
