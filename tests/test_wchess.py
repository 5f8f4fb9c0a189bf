"""wchess example: chessboard legality + move grammar (libwchess analog).

Mirrors the reference's libwchess/test-chessboard.cpp scenarios at the
same capability level (basic validation; no castling/en-passant/
promotion) and checks the generated GBNF drives the grammar engine with
the 'move' start rule like wchess does (i_start_rule = "move").
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.wchess import Chessboard  # noqa: E402

from open_whisper_kit_tpu.decode.grammar import Grammar  # noqa: E402


def test_opening_moves_and_notation():
    b = Chessboard()
    assert b.process("e4") == "e2-e4"            # pawn shorthand
    assert b.process("e5") == "e7-e5"            # black replies
    assert b.process("knight to f3") == "g1-f3"  # piece name resolution
    assert b.process("b8 to c6") == "b8-c6"      # from-square form
    assert b.process("bishop to c4") == "f1-c4"


def test_illegal_moves_rejected():
    b = Chessboard()
    assert b.process("e5") == ""                 # pawn can't jump 3
    assert b.process("knight to d5") == ""       # unreachable
    assert b.process("queen to h5") == ""        # blocked by own pawn
    assert b.process("d2 to d5") == ""           # too far
    assert b.process("e7 to e5") == ""           # not your piece
    assert b.process("") == ""
    assert b.process("xyz") == ""
    # board unchanged -> e4 still legal
    assert b.process("e4") == "e2-e4"


def test_capture_and_check_constraints():
    b = Chessboard()
    for mv in ("e4", "d5"):
        assert b.process(mv)
    assert b.process("pawn to d5") == "e4-d5"    # capture
    assert b.process("queen to d5") == "d8-d5"   # recapture
    # scholar's-mate-style check: white must be able to give check later;
    # here verify a pinned piece can't expose the king
    b2 = Chessboard()
    for mv in ("e4", "e5", "bishop to c4", "knight to c6",
               "queen to f3", "d6"):
        assert b2.process(mv), mv
    assert b2.process("queen to f7") == "f3-f7#" or \
        b2.process("queen to f7") == "f3-f7"     # mate marker when no reply


def test_grammar_shape_and_machinery():
    b = Chessboard()
    g = b.grammar()
    assert g.startswith('move ::= " " ((piece | frompos) " " "to "?)? topos')
    assert '"knight"' in g and '"pawn"' in g
    assert '"e2"' in g and '"e4"' in g
    assert '"e5"' not in g                        # not reachable for white

    gr = Grammar.from_gbnf(g, start="move")
    assert gr.stacks, "grammar has no active stacks"

    def accepts(text: str) -> bool:
        st = gr.copy()
        for ch in text.encode():
            st.accept_char(ch)
            if not st.stacks:
                return False
        return True

    assert accepts(" knight to f3")
    assert accepts(" e2 to e4")
    assert accepts(" d4")                         # bare pawn shorthand
    assert not accepts(" knight to z9")
    assert not accepts(" queen")                  # queen has no move yet


def test_prompt_mode_grammar():
    b = Chessboard()
    b.set_prompt("rook to d4, f3")
    g = b.grammar()
    assert 'prompt ::= " rook to d4, f3"' in g
    assert g.startswith('move ::= prompt " " frompos " " "to "? topos')
    # prompt prefix is stripped when processing
    assert b.process("rook to d4, f3 e2 to e4") == "e2-e4"


def test_fools_mate_ends_game():
    b = Chessboard()
    for mv in ("f3", "e5", "g4"):
        assert b.process(mv), mv
    res = b.process("queen to h4")
    assert res == "d8-h4#"                        # checkmate marker
    assert b.grammar() == ""                      # no legal white moves
