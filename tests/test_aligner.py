"""DiarizationAligner tests — direct port of the reference's Swift suite
(tests/OpenWhisperKitTests/DiarizationAlignerTests.swift)."""

import pytest

from open_whisper_kit_tpu.align.aligner import (
    AlignmentOptions, WordTiming, align)
from open_whisper_kit_tpu.align.rttm import RttmSegment


def w(text, start, end, prob=0.9):
    return WordTiming(text, start, end, prob)


def seg(speaker, start, end):
    return RttmSegment("f", start, end - start, speaker)


def test_basic_alignment():
    r = align([w("hello", 0.1, 0.5), w("world", 0.6, 1.0)],
              [seg("speaker_0", 0.0, 2.0)])
    assert r.words[0].speaker == "speaker_0"
    assert r.words[1].speaker == "speaker_0"


def test_boundary_spanning():
    r = align([w("crossing", 0.8, 1.4)],
              [seg("speaker_0", 0.0, 1.0), seg("speaker_1", 1.0, 2.0)])
    assert r.words[0].speaker == "speaker_1"  # larger overlap wins


def test_zero_duration_word():
    r = align([w(",", 1.5, 1.5)], [seg("speaker_0", 0.0, 2.0)])
    assert r.words[0].speaker == "speaker_0"


def test_no_matching_segment():
    r = align([w("orphan", 5.0, 6.0)], [seg("speaker_0", 0.0, 2.0)],
              AlignmentOptions(fill_nearest=False))
    assert r.words[0].speaker is None


def test_fill_nearest():
    r = align([w("gap", 3.0, 4.0)],
              [seg("speaker_0", 0.0, 2.0), seg("speaker_1", 5.0, 7.0)],
              AlignmentOptions(fill_nearest=True))
    assert r.words[0].speaker == "speaker_0"


def test_empty_words():
    r = align([], [seg("s0", 0, 1)])
    assert r.words == [] and r.segments == [] and r.text == ""


def test_empty_segments():
    r = align([w("alone", 0, 1)], [])
    assert r.words[0].speaker is None


def test_sentence_smoothing():
    words = [w("Hello", 0.0, 0.5), w("world,", 0.5, 1.0), w("how", 1.0, 1.5),
             w("are", 1.5, 2.0), w("you?", 2.0, 2.5)]
    segs = [seg("speaker_0", 0.0, 1.0), seg("speaker_1", 1.0, 2.0),
            seg("speaker_0", 2.0, 3.0)]
    r = align(words, segs, AlignmentOptions(sentence_smoothing=True))
    speakers = {x.speaker for x in r.words if x.speaker}
    assert len(speakers) == 1


def test_sentence_smoothing_disabled():
    words = [w("Hello", 0.0, 0.5), w("world", 0.5, 1.0)]
    segs = [seg("speaker_0", 0.0, 0.6), seg("speaker_1", 0.6, 1.5)]
    r = align(words, segs, AlignmentOptions(sentence_smoothing=False))
    assert r.words[0].speaker == "speaker_0"
    assert r.words[1].speaker == "speaker_1"


def test_utterance_grouping():
    words = [w("Hello.", 0.0, 1.0), w("Hi.", 1.0, 2.0)]
    segs = [seg("speaker_0", 0.0, 1.0), seg("speaker_1", 1.0, 2.0)]
    r = align(words, segs, AlignmentOptions(sentence_smoothing=False))
    assert len(r.segments) == 2
    assert r.segments[0].speaker == "speaker_0"
    assert r.segments[1].speaker == "speaker_1"


def test_text_generation():
    words = [w("Hello.", 0.0, 1.0), w("Hi.", 1.0, 2.0)]
    segs = [seg("speaker_0", 0.0, 1.0), seg("speaker_1", 1.0, 2.0)]
    r = align(words, segs, AlignmentOptions(sentence_smoothing=False))
    assert "speaker_0" in r.text and "speaker_1" in r.text
    assert r.text == "[speaker_0]: Hello.\n[speaker_1]: Hi."


def test_tie_breaking_earlier_speaker():
    r = align([w("equal", 0.5, 1.5)],
              [seg("speaker_0", 0.0, 1.0), seg("speaker_1", 1.0, 2.0)])
    assert r.words[0].speaker == "speaker_0"


def test_max_words_validation():
    with pytest.raises(ValueError):
        align([w("hello", 0, 1)], [seg("speaker_0", 0, 2)],
              AlignmentOptions(max_words_in_sentence=0))
